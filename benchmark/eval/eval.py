#!/usr/bin/env python
"""Geometric depth evaluation — DepthCrafter protocol.

Rebuild of reference benchmark/eval/eval.py: per sequence, a single global
least-squares scale/shift alignment of predicted disparity against GT
disparity (lstsq), inversion back to depth, clipping to the dataset max, then
masked AbsRel / RMSE / delta1 over valid pixels.  Dataset configs (max depth,
eval length, crop windows) reproduce reference eval.py:140-223 exactly.

Prediction layout: per-frame ``.npy`` files mirroring the manifest image
paths (written by benchmark/infer/infer.py), identical to the reference.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np

try:
    from benchmark.eval import metrics as metric_mod
except ImportError:  # direct script execution
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import metrics as metric_mod

EVAL_METRICS = ["abs_relative_difference", "rmse_linear", "delta1_acc"]


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    json_name: str
    max_depth: float
    max_eval_len: int
    crop: tuple  # (a, b, c, d) -> [a:b, c:d]
    min_depth: float = 0.1


# reference eval.py:140-223
DATASET_CONFIGS = {
    "kitti": DatasetConfig("kitti/kitti_video.json", 80.0, 110,
                           (0, 374, 0, 1242)),
    "kitti_500": DatasetConfig("kitti/kitti_video_500.json", 80.0, 500,
                               (0, 374, 0, 1242)),
    "sintel": DatasetConfig("sintel/sintel_video.json", 70.0, 100,
                            (0, 436, 0, 1024)),
    "nyuv2_500": DatasetConfig("nyuv2/nyuv2_video_500.json", 10.0, 500,
                               (45, 471, 41, 601)),
    "bonn": DatasetConfig("bonn/bonn_video.json", 10.0, 110,
                          (0, 480, 0, 640)),
    "bonn_500": DatasetConfig("bonn/bonn_video_500.json", 10.0, 500,
                              (0, 480, 0, 640)),
    "scannet": DatasetConfig("scannet/scannet_video.json", 10.0, 90,
                             (8, -8, 11, -11)),
    "scannet_500": DatasetConfig("scannet/scannet_video_500.json", 10.0, 500,
                                 (8, -8, 11, -11)),
}


def base_dataset(name: str) -> str:
    return name[:-4] if name.endswith("_500") else name


def load_gt(path: str, factor: float) -> np.ndarray:
    """GT depth loader (reference eval.py:42-50): zeros -> -1 sentinel."""
    if path.endswith(".npy"):
        depth = np.load(path)
    else:
        import cv2
        depth = np.asarray(cv2.imread(path, -1))
    depth = depth / factor
    depth = depth.astype(np.float64)
    depth[depth == 0] = -1
    return depth


def load_pred(path: str, target_hw=None) -> np.ndarray:
    """Prediction loader (reference eval.py:24-40): npy (raw) or 8-bit image."""
    if path.endswith(".npy"):
        pred = np.load(path).astype(np.float32)
    else:
        import cv2
        img = cv2.imread(path)
        pred = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32) * 255.0
    if target_hw is not None and pred.shape[:2] != tuple(target_hw):
        import cv2
        pred = cv2.resize(pred, (target_hw[1], target_hw[0]))
    return pred


def align_disparity_lstsq(preds: np.ndarray, gts: np.ndarray,
                          valid_mask: np.ndarray):
    """Global scale/shift in disparity space (reference eval.py:88-97)."""
    gt_disp = 1.0 / (gts[valid_mask].reshape(-1, 1).astype(np.float64) + 1e-8)
    preds = np.clip(preds, a_min=1e-3, a_max=None)
    pred_disp = preds[valid_mask].reshape(-1, 1).astype(np.float64)
    a = np.concatenate([pred_disp, np.ones_like(pred_disp)], axis=-1)
    x = np.linalg.lstsq(a, gt_disp, rcond=None)[0]
    scale, shift = float(x[0][0]), float(x[1][0])
    return scale, shift


def disparity_to_depth(disp: np.ndarray) -> np.ndarray:
    out = np.zeros_like(disp)
    pos = disp > 0
    out[pos] = 1.0 / disp[pos]
    return out


def eval_sequence(pred_paths, gt_paths, factors, cfg: DatasetConfig,
                  metric_names=EVAL_METRICS):
    """One sequence -> list of metric values (reference eval.py:66-121)."""
    a, b, c, d = cfg.crop
    gts, preds = [], []
    for pred_path, gt_path, factor in zip(pred_paths, gt_paths, factors):
        if not os.path.exists(pred_path):
            continue
        gt = load_gt(gt_path, factor)[a:b, c:d]
        preds.append(load_pred(pred_path, target_hw=gt.shape))
        gts.append(gt)
    gts = np.stack(gts, axis=0)[:cfg.max_eval_len]
    preds = np.stack(preds, axis=0)[:cfg.max_eval_len]

    valid_mask = (gts > 1e-3) & (gts < cfg.max_depth)
    scale, shift = align_disparity_lstsq(preds, gts, valid_mask)
    aligned = np.clip(scale * np.clip(preds, 1e-3, None) + shift,
                      1e-3, None)
    pred_depth = np.clip(disparity_to_depth(aligned), 1e-3, cfg.max_depth)

    # drop frames with no valid pixels (reference eval.py:111-115)
    n = valid_mask.sum(axis=(-1, -2))
    keep = n > 0
    pred_depth, gts, valid_mask = pred_depth[keep], gts[keep], valid_mask[keep]

    return [metric_mod.METRICS[m](pred_depth, gts, valid_mask)
            for m in metric_names]


def iter_manifest(json_file: str, dataset: str):
    """Yield (scene_name, entries) from a canonical manifest."""
    with open(json_file) as f:
        manifest = json.load(f)
    for scene in manifest[dataset]:
        for name, entries in scene.items():
            yield name, entries


def evaluate_dataset(dataset: str, infer_path: str, benchmark_path: str,
                     metric_names=EVAL_METRICS):
    cfg = DATASET_CONFIGS[dataset]
    base = base_dataset(dataset)
    json_file = os.path.join(benchmark_path, cfg.json_name)
    root_path = os.path.join(benchmark_path, base)
    results = []
    for _name, entries in iter_manifest(json_file, base):
        entries = entries[:cfg.max_eval_len]
        pred_paths = [
            os.path.join(infer_path, base, e["image"])
            .replace(".jpg", ".npy").replace(".png", ".npy")
            for e in entries
        ]
        gt_paths = [os.path.join(root_path, e["gt_depth"]) for e in entries]
        factors = [e["factor"] for e in entries]
        results.append(eval_sequence(pred_paths, gt_paths, factors, cfg,
                                     metric_names))
    mean = np.mean(np.asarray(results), axis=0)
    return dict(zip(metric_names, mean.tolist()))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--infer_path", type=str, default="")
    parser.add_argument("--benchmark_path", type=str, default="")
    parser.add_argument("--datasets", type=str, nargs="+",
                        default=["sintel", "scannet", "kitti", "bonn"])
    args = parser.parse_args(argv)

    results_path = os.path.join(args.infer_path, "results.txt")
    for dataset in args.datasets:
        res = evaluate_dataset(dataset, args.infer_path, args.benchmark_path)
        line = "-" * 50
        with open(results_path, "a") as f:
            f.write(f"<{line} {dataset} start {line}>\n")
            for k, v in res.items():
                print(f"{k}: {v:04f}")
                f.write(f"{k}: {v:04f}\n")
            f.write(f"<{line} {dataset} finish {line}>\n")
        print(dataset, res)


if __name__ == "__main__":
    main()
