#!/bin/bash
# Data relayout helper (parity with the reference's organize_data.sh):
# builds the tree hairci.serve.visualizer.datasets.default_datasets expects:
#   data/<dataset>/{benchmark.json, results/<model>_top100_results.json,
#                   hair/, face/}
set -e
DATASET=${1:?usage: organize_data.sh <dataset> <benchmark.json> <results_dir> <hair_dir> [face_dir]}
BENCH=${2:?}; RESULTS=${3:?}; HAIR=${4:?}; FACE=${5:-}
mkdir -p "data/$DATASET/results"
cp "$BENCH" "data/$DATASET/benchmark.json"
cp "$RESULTS"/*_top100_results.json "data/$DATASET/results/" 2>/dev/null || true
ln -sfn "$(realpath "$HAIR")" "data/$DATASET/hair"
[ -n "$FACE" ] && ln -sfn "$(realpath "$FACE")" "data/$DATASET/face"
echo "organized data/$DATASET"
