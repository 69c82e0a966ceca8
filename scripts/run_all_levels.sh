#!/usr/bin/env bash
# Full pipeline: RGB phase then 3 language levels (reference run_all_levels.sh).
# Usage: bash scripts/run_all_levels.sh <scene_path> <output_root> [levels...]
set -euo pipefail
SCENE=$1
OUT=$2
shift 2
LEVELS=(${@:-1 2 3})
DIR=$(dirname "$0")

# Stage B: RGB training, 30k iterations (reference run_all_levels.sh:30-45).
python "$DIR/train.py" -s "$SCENE" -m "$OUT" --iterations 30000 \
  --checkpoint_iterations 30000

# Stage C: language-feature training per level from the RGB checkpoint
# (reference run_all_levels.sh:46-62; -r 2 downsampling applied there).
for LEVEL in "${LEVELS[@]}"; do
  python "$DIR/train.py" -s "$SCENE" -m "${OUT}" -r 2 \
    --include_feature --feature_level "$LEVEL" \
    --start_checkpoint "$OUT/chkpnt30000.pth" \
    --vq_layer_num 1 --codebook_size 64 --cos_loss --topk 4 \
    --iterations 10000
done
