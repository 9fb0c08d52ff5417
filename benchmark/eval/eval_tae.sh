#!/bin/sh
# Temporal Alignment Error on ScanNet (frames 10-180, 20 scenes, hard crop).
# Usage: eval_tae.sh <pred_disp_root> <benchmark_root>
set -x
set -e

pred_disp_root=$1
benchmark_root=$2

python3 benchmark/eval/eval_tae.py --infer_path "$pred_disp_root" \
    --benchmark_path "$benchmark_root" --datasets scannet \
    --start_idx 10 --end_idx 180 --eval_scenes_num 20 --hard_crop
