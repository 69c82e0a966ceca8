#!/usr/bin/env bash
# RGB-only training with periodic saves + test-split reports (reference
# run_hastane_rgb.sh). Usage: bash scripts/run_rgb_only.sh <scene> <out>
set -euo pipefail
SCENE=$1
OUT=$2
DIR=$(dirname "$0")
ITER=${ITER:-30000}
python "$DIR/train.py" -s "$SCENE" -m "$OUT" \
  --iterations "$ITER" \
  --save_iterations 3000 6000 10000 "$ITER" \
  --checkpoint_iterations "$ITER" \
  --test_iterations 1000
echo "RGB training complete: ${OUT}_-1/chkpnt${ITER}.npz"
echo "Visualize: python scripts/simple_viser.py --ply_path ${OUT}_-1/point_cloud/iteration_${ITER}/point_cloud.ply"
