#!/usr/bin/env python
"""Temporal Alignment Error (TAE) evaluation.

Rebuild of reference benchmark/eval/eval_tae.py: after the same
disparity-space global alignment as eval.py, each consecutive depth pair is
cross-projected with the GT pose/intrinsics (backproject -> rigid transform ->
project -> nearest-pixel z-buffer write with last-write-wins, exactly matching
the reference's scatter) and masked AbsRel is averaged in both directions,
scaled x100.  ScanNet protocol: frames 10-180, 20 scenes, hard crop
(reference eval_tae.sh, eval_tae.py:238-249).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

try:
    from benchmark.eval.eval import (
        align_disparity_lstsq,
        disparity_to_depth,
        load_gt,
        load_pred,
    )
except ImportError:
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from eval import (
        align_disparity_lstsq,
        disparity_to_depth,
        load_gt,
        load_pred,
    )

TAE_CONFIGS = {
    # reference eval_tae.py:238-249 points at scannet_video.json, but only
    # the TAE manifest (gen_json_scannet_tae: color_origin frames, stride 1,
    # K + pose per entry) actually carries the fields this protocol needs —
    # we use it directly.
    "scannet": dict(json_name="scannet/scannet_video_tae.json",
                    max_depth=10.0, crop=(8, -8, 11, -11)),
    # sintel: requires extract.extract_sintel(cam_root=camdata_left) so the
    # manifest carries per-frame K + pose.  The reference lists a sintel TAE
    # config too but its extractor drops the camdata, leaving it unusable
    # (reference eval_tae.py:223-249 only wires scannet) — ours is runnable.
    "sintel": dict(json_name="sintel/sintel_video_tae.json", max_depth=70.0,
                   crop=(0, 436, 0, 1024)),
}


def reproject_depth(depth1: np.ndarray, r_2_1: np.ndarray, t_2_1: np.ndarray,
                    k: np.ndarray) -> np.ndarray:
    """Project depth1 into the other frame; z-buffer via last-write-wins
    scatter (reference eval_tae.py:60-100)."""
    h, w = depth1.shape
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    xx, yy = np.meshgrid(np.arange(w, dtype=depth1.dtype),
                         np.arange(h, dtype=depth1.dtype))
    x = (xx - cx) * depth1 / fx
    y = (yy - cy) * depth1 / fy
    pts = np.stack([x.ravel(), y.ravel(), depth1.ravel()], axis=1)
    pts2 = pts @ r_2_1.T + t_2_1
    xw, yw, zw = pts2[:, 0], pts2[:, 1], pts2[:, 2]
    xp = np.round(xw * fx / zw + cx).astype(np.int64)
    yp = np.round(yw * fy / zw + cy).astype(np.int64)
    ok = (xp >= 0) & (xp < w) & (yp >= 0) & (yp < h)
    proj = np.zeros((h, w), dtype=depth1.dtype)
    proj[yp[ok], xp[ok]] = zw[ok]  # last write wins, as in the reference
    return proj


def tae_pair(depth1, depth2, r_2_1, t_2_1, k, mask2) -> float:
    """One-direction TAE term (reference eval_tae.py:60-107)."""
    proj = reproject_depth(depth1, r_2_1, t_2_1, k)
    valid = (proj > 0) & (depth2 > 0) & mask2
    if valid.sum() == 0:
        return 0.0
    gt, pred = depth2[valid], proj[valid]
    return float(np.mean(np.abs(gt - pred) / gt))


def eval_tae_sequence(pred_paths, gt_paths, factors, ks, poses, crop,
                      max_depth, hard_crop=True) -> float:
    """reference eval_tae.py:109-217."""
    a, b, c, d = crop
    gts, preds, used = [], [], []
    for i, p in enumerate(pred_paths):
        if not os.path.exists(p):
            continue
        gt = load_gt(gt_paths[i], factors[i])[a:b, c:d]
        pred = load_pred(p)
        if hard_crop:
            pred = pred[a:b, c:d]
        if pred.shape[:2] != gt.shape[:2]:
            import cv2
            pred = cv2.resize(pred, (gt.shape[1], gt.shape[0]))
        gts.append(gt)
        preds.append(pred)
        used.append(i)
    gts = np.stack(gts, axis=0)
    preds = np.stack(preds, axis=0)

    valid_mask = (gts > 1e-3) & (gts < max_depth)
    scale, shift = align_disparity_lstsq(preds, gts, valid_mask)
    aligned = np.clip(scale * np.clip(preds, 1e-3, None) + shift, 1e-3, None)
    pred_depth = np.clip(disparity_to_depth(aligned), 1e-3, max_depth)

    error_sum = 0.0
    for j in range(len(used) - 1):
        t_1 = poses[used[j]]
        t_2 = poses[used[j + 1]]
        t_2_1 = np.linalg.inv(t_2) @ t_1
        k = np.asarray(ks[used[j]])
        d1, d2 = pred_depth[j], pred_depth[j + 1]
        ones = np.ones_like(d1, dtype=bool)
        error_sum += tae_pair(d1, d2, t_2_1[:3, :3], t_2_1[:3, 3], k, ones)
        t_1_2 = np.linalg.inv(t_2_1)
        error_sum += tae_pair(d2, d1, t_1_2[:3, :3], t_1_2[:3, 3], k, ones)
    return error_sum / (2 * (len(used) - 1)) * 100.0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--infer_path", type=str, default="")
    parser.add_argument("--benchmark_path", type=str, default="")
    parser.add_argument("--datasets", type=str, nargs="+",
                        default=["scannet"])
    parser.add_argument("--start_idx", type=int, default=0)
    parser.add_argument("--end_idx", type=int, default=180)
    parser.add_argument("--eval_scenes_num", type=int, default=20)
    parser.add_argument("--hard_crop", action="store_true", default=False)
    args = parser.parse_args(argv)

    results_path = os.path.join(args.infer_path, "results.txt")
    for dataset in args.datasets:
        cfg = TAE_CONFIGS[dataset]
        json_file = os.path.join(args.benchmark_path, cfg["json_name"])
        root = os.path.join(args.benchmark_path, dataset)
        with open(json_file) as f:
            manifest = json.load(f)
        total, count = 0.0, 0
        for scene in manifest[dataset][:args.eval_scenes_num]:
            for _name, entries in scene.items():
                entries = entries[args.start_idx:args.end_idx]
                pred_paths = [
                    os.path.join(args.infer_path, dataset, e["image"])
                    .replace(".jpg", ".npy").replace(".png", ".npy")
                    for e in entries
                ]
                gt_paths = [os.path.join(root, e["gt_depth"])
                            for e in entries]
                factors = [e["factor"] for e in entries]
                ks = [np.asarray(e["K"]) for e in entries]
                poses = [np.asarray(e["pose"]) for e in entries]
                total += eval_tae_sequence(
                    pred_paths, gt_paths, factors, ks, poses,
                    cfg["crop"], cfg["max_depth"],
                    hard_crop=args.hard_crop)
                count += 1
        tae = total / max(count, 1)
        print(f"{dataset}: tae {tae}")
        with open(results_path, "a") as f:
            f.write(f"{dataset}: {tae}\n")


if __name__ == "__main__":
    main()
