#!/usr/bin/env bash
# Original-style two-stage pipeline (reference run_original_style.sh):
# RGB 30k iters into <OUT>_rgb, then feature levels 1-3 (10k each) from the
# RGB checkpoint into separate per-level model dirs.
# Usage: bash scripts/run_original_style.sh <scene_path> <output_root> [name]
set -euo pipefail
SCENE=$1
OUT=$2
NAME=${3:-scene}
DIR=$(dirname "$0")
ITER_RGB=${ITER_RGB:-30000}
ITER_FEAT=${ITER_FEAT:-10000}
# Measured-fastest production feature-training config (see train.sh note);
# TILE_BUDGET=0 restores exact reference semantics.
TILE_BUDGET=${TILE_BUDGET:-1e-6}

python "$DIR/train.py" -s "$SCENE" -m "$OUT/${NAME}_rgb" \
  --iterations "$ITER_RGB" --save_iterations "$ITER_RGB" \
  --checkpoint_iterations "$ITER_RGB" --quiet
RGB_CKPT="$OUT/${NAME}_rgb_-1/chkpnt${ITER_RGB}.npz"
[ -f "$RGB_CKPT" ] || { echo "RGB training failed: no $RGB_CKPT" >&2; exit 1; }

for LEVEL in 1 2 3; do
  python "$DIR/train.py" -s "$SCENE" \
    -m "$OUT/${NAME}_feature_level_${LEVEL}" \
    --start_checkpoint "$RGB_CKPT" \
    --include_feature --feature_level "$LEVEL" \
    --vq_layer_num 1 --codebook_size 64 --cos_loss --topk 4 \
    --tile_budget "$TILE_BUDGET" \
    --iterations "$ITER_FEAT" --save_iterations "$ITER_FEAT" \
    --checkpoint_iterations "$ITER_FEAT"
done
