#!/usr/bin/env bash
# Round-5 session-2 measurement queue (one chip window):
#   1. capped feature-train full-step A/Bs (fused backward / fused gram /
#      sized expansion buffer / cull arm)
#   2. exact-mode training profile (tile_budget=0)
#   3. strong-scaling proxy artifact -> SCALING_CHIP.jsonl
#   4. full bench (serving headline + temporal + serve worker rows)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@"
  local rc=$?
  echo "=== $name exit $rc ==="
}

run train_ab        3600 python scripts/profile_train_ab.py
run train_exact     2400 env LSV2_TILE_BUDGET=0 python scripts/profile_train.py
run scaling_chip    3000 bash scripts/run_scaling_chip.sh
run bench5          3600 python bench.py
echo "queue5 done"
