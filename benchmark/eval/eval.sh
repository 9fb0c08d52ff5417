#!/bin/sh
# Evaluate sintel/scannet/kitti/bonn (~110-frame protocol).
# Usage: eval.sh <pred_disp_root> <benchmark_root>
set -x
set -e

pred_disp_root=$1
benchmark_root=$2

python3 benchmark/eval/eval.py --infer_path "$pred_disp_root" \
    --benchmark_path "$benchmark_root" --datasets sintel scannet kitti bonn
