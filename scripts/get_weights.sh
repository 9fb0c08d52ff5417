#!/bin/sh
# Download the published Video-Depth-Anything checkpoints (reference
# get_weights.sh / MODEL_DOWNLOAD_GUIDE.md).  The flat .pth state dicts load
# directly through vda_tpu/utils/convert.py.
set -e

mkdir -p checkpoints
cd checkpoints

BASE_REL="https://huggingface.co/depth-anything/Video-Depth-Anything"
BASE_MET="https://huggingface.co/depth-anything/Metric-Video-Depth-Anything"

for enc in Small Base Large; do
    case $enc in
        Small) tag=vits ;;
        Base)  tag=vitb ;;
        Large) tag=vitl ;;
    esac
    wget -nc "${BASE_REL}-${enc}/resolve/main/video_depth_anything_${tag}.pth"
    wget -nc "${BASE_MET}-${enc}/resolve/main/metric_video_depth_anything_${tag}.pth"
done

echo "checkpoints ready:"
ls -la *.pth
