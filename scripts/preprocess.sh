#!/usr/bin/env bash
# Language-feature preprocessing (reference preprocess.sh).
# Usage: bash scripts/preprocess.sh <dataset_path>
set -euo pipefail
DIR=$(dirname "$0")
python "$DIR/preprocess.py" --dataset_path "$1"
