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
# This script reproduces the reference pipeline, so it defaults to EXACT
# binning semantics (TILE_BUDGET=0). Set TILE_BUDGET=1e-6 to opt into the
# measured-fastest budget-capped config (15.93 vs 11.39 it/s on v5e-1;
# approximate — can drop transmittance-bound-invisible entries).
TILE_BUDGET=${TILE_BUDGET:-0}
if [ "$TILE_BUDGET" != "0" ]; then
  echo "NOTICE: TILE_BUDGET=$TILE_BUDGET — approximate budget-capped binning is ACTIVE (not exact reference semantics)." >&2
fi

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
