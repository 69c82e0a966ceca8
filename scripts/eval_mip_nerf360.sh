#!/usr/bin/env bash
# Mip-NeRF360 eval (reference eval_mip_nerf360.sh; mask_thresh 0.4).
set -euo pipefail
CASE=$1
PATH_ROOT=$2
CKPT_ROOT=$3
IDX=${4:-0}
ITER=${5:-10000}
DIR=$(dirname "$0")

python "$DIR/eval_mip_nerf360.py" \
  --dataset_name "$CASE" --path_root "$PATH_ROOT" --ckpt_root "$CKPT_ROOT" \
  --index "$IDX" --iteration "$ITER" --mask_thresh 0.4
