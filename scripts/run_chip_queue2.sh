#!/usr/bin/env bash
# Second measurement wave for the round-4 chip window (run after
# run_chip_queue.sh finishes; pass the pid of that queue to wait on it).
#
#   1. capped_stages      — stage attribution of the budget-capped 728p
#                           frame
#   2. bench_unfused      — fused-vs-unfused Gram query A/B
#   3. bench2             — full bench re-run
#   4. bf16cells_compile  — verify the log1p f32 fix lets the bf16-cells
#                           kernel compile on v5e Mosaic (perf already
#                           measured a dead end; flag must still work)
#   5. train_bwd          — feature-step backward attribution
set -u
OUT=${OUT:-/tmp/chip_logs}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"

if [ "${1:-}" != "" ]; then
  echo "waiting on queue pid $1"
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

run capped_stages       1800 python scripts/profile_capped_stages.py
# cap is 128-lane constrained (no cap-64 layout); the speed A/B below is
# fused-vs-unfused query instead, and a full bench re-run picks up the
# reworked 512-d decode path (decode_728p_fps).
run bench_fused       1800 env LSV2_FUSED_QUERY=1 LSV2_BENCH_STAGES=0 LSV2_BENCH_SERVE=0 python bench.py
run bench2              2700 python bench.py
run bf16cells_compile    900 python scripts/check_bf16cells_compile.py
run train_bwd           1800 python scripts/profile_train_bwd.py
echo "queue2 done"
