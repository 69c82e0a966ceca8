#!/usr/bin/env bash
# Full pipeline: RGB phase then 3 language levels (reference run_all_levels.sh).
# Usage: bash scripts/run_all_levels.sh <scene_path> <output_root> [levels...]
#
# train.py appends "_{feature_level}" to the model dir (reference
# train.py:354), so the RGB phase (default feature_level=-1) writes to
# ${OUT}_-1/ and checkpoints are .npz (this framework's format).
set -euo pipefail
SCENE=$1
OUT=$2
shift 2
LEVELS=(${@:-1 2 3})
DIR=$(dirname "$0")
ITER_RGB=${ITER_RGB:-30000}
ITER_FEAT=${ITER_FEAT:-10000}

RGB_CKPT="${OUT}_-1/chkpnt${ITER_RGB}.npz"

# Stage B: RGB training (reference run_all_levels.sh:24-40); skipped when the
# checkpoint already exists, like the reference.
if [ ! -f "$RGB_CKPT" ]; then
  python "$DIR/train.py" -s "$SCENE" -m "$OUT" --iterations "$ITER_RGB" \
    --save_iterations "$ITER_RGB" --checkpoint_iterations "$ITER_RGB"
  [ -f "$RGB_CKPT" ] || { echo "RGB checkpoint not created at $RGB_CKPT" >&2; exit 1; }
fi

# Stage C: language-feature training per level from the RGB checkpoint
# (reference run_all_levels.sh:46-62; -r 2 downsampling applied there).
for LEVEL in "${LEVELS[@]}"; do
  python "$DIR/train.py" -s "$SCENE" -m "$OUT" -r 2 \
    --include_feature --feature_level "$LEVEL" \
    --start_checkpoint "$RGB_CKPT" \
    --vq_layer_num 1 --codebook_size 64 --cos_loss --topk 4 \
    --iterations "$ITER_FEAT" \
    --save_iterations "$ITER_FEAT" --checkpoint_iterations "$ITER_FEAT"
done
