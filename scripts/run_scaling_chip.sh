#!/usr/bin/env bash
# Strong-scaling proxy on the one real chip -> SCALING_CHIP.jsonl
# (VERDICT round-4 #5a; see bench_scaling_chip.py's honesty notes).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
timeout 3000 python bench_scaling_chip.py > SCALING_CHIP.jsonl 2> /tmp/scaling_chip.err
rc=$?
echo "bench_scaling_chip exit $rc (stderr in /tmp/scaling_chip.err)" >&2
tail -3 SCALING_CHIP.jsonl >&2
exit $rc
