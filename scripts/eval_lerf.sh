#!/usr/bin/env bash
# LERF open-vocabulary eval (reference eval_lerf.sh).
# Usage: bash scripts/eval_lerf.sh <scene_name> <index> <feature_iteration>
set -euo pipefail
CASE=$1
PATH_ROOT=$2
CKPT_ROOT=$3
IDX=${4:-0}
ITER=${5:-10000}
DIR=$(dirname "$0")

python "$DIR/eval_lerf.py" \
  --dataset_name "$CASE" --path_root "$PATH_ROOT" --ckpt_root "$CKPT_ROOT" \
  --index "$IDX" --iteration "$ITER" --mask_thresh 0.4
