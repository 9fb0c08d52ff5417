#!/usr/bin/env python
"""Benchmark inference: manifest -> per-frame .npy predictions.

Rebuild of reference benchmark/infer/infer.py: for each dataset manifest
entry, load the frame images, run the full windowed inference at fp32 with
target_fps=1, and save per-frame ``.npy`` predictions mirroring the image
paths.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np  # noqa: E402


def main(argv=None):
    from vda_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # vitl compiles are minutes; cache across runs
    parser = argparse.ArgumentParser()
    parser.add_argument("--infer_path", type=str, default="")
    parser.add_argument("--json_file", type=str, default="")
    parser.add_argument("--datasets", type=str, nargs="+",
                        default=["scannet", "nyuv2"])
    parser.add_argument("--input_size", type=int, default=518)
    parser.add_argument("--encoder", type=str, default="vitl",
                        choices=["vits", "vitb", "vitl", "vitg", "tiny"])
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--random-init", action="store_true")
    args = parser.parse_args(argv)

    import cv2

    from apps.run import load_model
    from vda_tpu.infer import infer_video_depth

    args.metric = False
    args.fp32 = True
    cfg, params = load_model(args)

    for dataset in args.datasets:
        with open(args.json_file) as f:
            manifest = json.load(f)
        root_path = os.path.dirname(args.json_file)
        for scene in manifest[dataset]:
            for _name, entries in scene.items():
                frames, pred_paths = [], []
                for e in entries:
                    img = cv2.imread(os.path.join(root_path, e["image"]))
                    frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
                    pred_paths.append(
                        os.path.join(args.infer_path, dataset, e["image"])
                        .replace(".jpg", ".npy").replace(".png", ".npy"))
                frames = np.stack(frames, axis=0)
                depths, _fps = infer_video_depth(
                    params, frames, target_fps=1, cfg=cfg,
                    input_size=args.input_size, fp32=True)
                for path, depth in zip(pred_paths, depths):
                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    np.save(path, depth)
                print(f"{_name}: {len(pred_paths)} frames")


if __name__ == "__main__":
    main()
