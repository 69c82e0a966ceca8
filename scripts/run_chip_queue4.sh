#!/usr/bin/env bash
# Fourth wave: benches with the OOM-fixed streaming decode.
set -u
OUT=${OUT:-/tmp/chip_logs}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
if [ "${1:-}" != "" ]; then
  echo "waiting on pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -n 25 "$OUT/$name.log"
  echo "=== $name exit $rc ==="
}
run bench4            2700 python bench.py
run bench_fused     1800 env LSV2_FUSED_QUERY=1 LSV2_BENCH_STAGES=0 LSV2_BENCH_SERVE=0 python bench.py
echo "queue4 done"
