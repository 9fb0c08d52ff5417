#!/bin/sh
# Evaluate the ~500-frame protocol (incl. nyuv2).
# Usage: eval_500.sh <pred_disp_root> <benchmark_root>
set -x
set -e

pred_disp_root=$1
benchmark_root=$2

python3 benchmark/eval/eval.py --infer_path "$pred_disp_root" \
    --benchmark_path "$benchmark_root" \
    --datasets kitti_500 scannet_500 bonn_500 nyuv2_500
