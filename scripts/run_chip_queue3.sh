#!/usr/bin/env bash
# Third measurement wave, round 4: re-runs after the decode-OOM fix,
# chunk=cap capped blend, and the 728p probe-budget fix.
set -u
OUT=${OUT:-/tmp/chip_logs}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -n 25 "$OUT/$name.log"
  echo "=== $name exit $rc ==="
}
run bench3            2700 python bench.py
run bench_fused     1800 env LSV2_FUSED_QUERY=1 LSV2_BENCH_STAGES=0 LSV2_BENCH_SERVE=0 python bench.py
run bf16cells_compile  900 python scripts/check_bf16cells_compile.py
run train_bwd         1800 python scripts/profile_train_bwd.py
echo "queue3 done"
