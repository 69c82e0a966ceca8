#!/usr/bin/env bash
# Canonical single-level language-feature training (reference train.sh:1-27).
# Usage: bash scripts/train.sh <scene_path> <output_path> <feature_level> [topk]
set -euo pipefail
SCENE=$1
OUT=$2
LEVEL=$3
TOPK=${4:-4}

python "$(dirname "$0")/train.py" \
  -s "$SCENE" -m "$OUT" \
  --include_feature --feature_level "$LEVEL" \
  --start_checkpoint "$OUT/chkpnt30000.pth" \
  --vq_layer_num 1 --codebook_size 64 --cos_loss --topk "$TOPK" \
  --iterations 10000
