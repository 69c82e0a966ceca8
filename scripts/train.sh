#!/usr/bin/env bash
# Canonical single-level language-feature training (reference train.sh:1-27).
# Usage: bash scripts/train.sh <scene_path> <output_path> <feature_level> [topk]
#
# The RGB checkpoint is expected at ${OUT}_-1/chkpnt30000.npz — train.py
# appends "_{feature_level}" to the model dir (reference train.py:354) and
# the RGB phase runs with the default feature_level=-1.
set -euo pipefail
SCENE=$1
OUT=$2
LEVEL=$3
TOPK=${4:-4}
RGB_CKPT=${RGB_CKPT:-"${OUT}_-1/chkpnt30000.npz"}
# Budget-capped binning is the measured-fastest production config on TPU
# (15.93 it/s vs 11.39 exact at 544x960/300k, v5e-1; grad-exact under an
# uncrossable budget, IoU-pinned at serving budgets). TILE_BUDGET=0
# restores exact reference semantics.
TILE_BUDGET=${TILE_BUDGET:-1e-6}
if [ "$TILE_BUDGET" != "0" ]; then
  echo "NOTICE: TILE_BUDGET=$TILE_BUDGET — approximate budget-capped binning is ACTIVE (TILE_BUDGET=0 restores exact reference semantics)." >&2
fi

python "$(dirname "$0")/train.py" \
  -s "$SCENE" -m "$OUT" \
  --include_feature --feature_level "$LEVEL" \
  --start_checkpoint "$RGB_CKPT" \
  --vq_layer_num 1 --codebook_size 64 --cos_loss --topk "$TOPK" \
  --tile_budget "$TILE_BUDGET" \
  --iterations 10000
