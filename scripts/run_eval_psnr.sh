#!/usr/bin/env bash
# RGB PSNR evaluation of a trained model (reference run_eval_araba.sh).
# Usage: bash scripts/run_eval_psnr.sh <scene_path> <model_dir> [iteration]
set -euo pipefail
SCENE=$1
MODEL=$2
ITER=${3:--1}
DIR=$(dirname "$0")
python "$DIR/eval_psnr.py" -s "$SCENE" -m "$MODEL" --iteration "$ITER"
