"""Benchmark suite tests: metric parity vs the torch oracle + end-to-end
protocol sanity on synthetic data."""

import json
import os

import numpy as np
import pytest

from tests.conftest import requires_torch


def _rand_depths(seed=0, n=6, h=40, w=50):
    rng = np.random.default_rng(seed)
    pred = rng.random((n, h, w)).astype(np.float64) * 8 + 0.5
    gt = rng.random((n, h, w)).astype(np.float64) * 8 + 0.5
    mask = rng.random((n, h, w)) > 0.2
    return pred, gt, mask


@requires_torch
def test_metrics_match_reference():
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_metric", "/root/reference/benchmark/eval/metric.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from benchmark.eval import metrics as ours

    pred, gt, mask = _rand_depths()
    tp, tg, tm = (torch.from_numpy(pred), torch.from_numpy(gt),
                  torch.from_numpy(mask))
    for name in ["abs_relative_difference", "squared_relative_difference",
                 "rmse_linear", "rmse_log", "log10", "delta1_acc",
                 "delta2_acc", "delta3_acc", "i_rmse", "silog_rmse"]:
        ref_val = float(getattr(ref, name)(tp.clone(), tg.clone(), tm.clone()))
        our_val = getattr(ours, name)(pred, gt, mask)
        np.testing.assert_allclose(our_val, ref_val, rtol=1e-6,
                                   err_msg=name)


@requires_torch
def test_tae_pair_matches_reference():
    import importlib.util
    import sys

    import torch

    sys.path.insert(0, "/root/reference/benchmark/eval")
    spec = importlib.util.spec_from_file_location(
        "ref_tae", "/root/reference/benchmark/eval/eval_tae.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from benchmark.eval.eval_tae import tae_pair

    rng = np.random.default_rng(1)
    h, w = 30, 40
    d1 = rng.random((h, w)) * 5 + 1
    d2 = rng.random((h, w)) * 5 + 1
    k = np.array([[50.0, 0, w / 2, 0], [0, 50.0, h / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    # small rigid motion
    theta = 0.02
    r = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1.0]])
    t = np.array([0.05, -0.02, 0.01])

    ref_val = ref.tae_torch(torch.from_numpy(d1), torch.from_numpy(d2),
                            torch.from_numpy(r), t, k,
                            torch.from_numpy(np.ones((h, w), bool)))
    our_val = tae_pair(d1, d2, r, t, k, np.ones((h, w), bool))
    np.testing.assert_allclose(our_val, float(ref_val), rtol=1e-6)


def _make_synthetic_benchmark(tmp_path, dataset="scannet", n_scenes=2,
                              n_frames=12, h=64, w=80):
    """Canonical layout + manifest + 'predictions' derived from GT disparity."""
    import cv2

    from benchmark.dataset_extract.extract_utils import gen_json

    rng = np.random.default_rng(0)
    bench_root = tmp_path / "bench"
    infer_root = tmp_path / "preds"
    ds_root = bench_root / dataset
    for s in range(n_scenes):
        scene = f"scene{s:04d}"
        for i in range(n_frames):
            depth_m = rng.random((h, w)) * 6 + 0.5  # metres, full size
            # canonical layout: GT depth stays FULL size (cropped at eval);
            # RGB — and hence predictions — are pre-cropped at extraction
            # (reference eval_utils.py:120-133 crops the image only)
            crop = depth_m[8:-8, 11:-11]
            img = (rng.random(crop.shape + (3,)) * 255).astype(np.uint8)
            color_dir = ds_root / scene / "color"
            depth_dir = ds_root / scene / "depth"
            color_dir.mkdir(parents=True, exist_ok=True)
            depth_dir.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(color_dir / f"{i:04d}.jpg"), img)
            cv2.imwrite(str(depth_dir / f"{i:04d}.png"),
                        (depth_m * 1000).astype(np.uint16))
            # perfect disparity prediction, arbitrarily scaled/shifted
            pred = 3.7 / crop + 0.11
            pred_path = infer_root / dataset / scene / "color" / f"{i:04d}.npy"
            pred_path.parent.mkdir(parents=True, exist_ok=True)
            np.save(pred_path, pred.astype(np.float32))
    gen_json(str(ds_root), dataset, 0, n_frames, 1,
             str(ds_root / "scannet_video.json"))
    return str(bench_root), str(infer_root)


def test_eval_pipeline_perfect_prediction(tmp_path):
    """A prediction that is an affine map of GT disparity must score ~perfectly
    under the disparity-space alignment protocol."""
    from benchmark.eval.eval import evaluate_dataset

    bench_root, infer_root = _make_synthetic_benchmark(tmp_path)
    res = evaluate_dataset("scannet", infer_root, bench_root)
    assert res["delta1_acc"] > 0.999
    assert res["abs_relative_difference"] < 1e-3
    assert res["rmse_linear"] < 0.05


def test_eval_pipeline_detects_bad_prediction(tmp_path):
    from benchmark.eval.eval import eval_sequence, DATASET_CONFIGS

    bench_root, infer_root = _make_synthetic_benchmark(tmp_path, n_scenes=1)
    # corrupt the predictions
    import glob
    for p in glob.glob(os.path.join(infer_root, "scannet", "*", "color",
                                    "*.npy")):
        np.save(p, np.random.default_rng(1).random((48, 58)).astype(np.float32))
    cfg = DATASET_CONFIGS["scannet"]
    manifest = json.load(open(os.path.join(bench_root, "scannet",
                                           "scannet_video.json")))
    entries = list(manifest["scannet"][0].values())[0]
    pred_paths = [os.path.join(infer_root, "scannet", e["image"])
                  .replace(".jpg", ".npy") for e in entries]
    gt_paths = [os.path.join(bench_root, "scannet", e["gt_depth"])
                for e in entries]
    factors = [e["factor"] for e in entries]
    vals = eval_sequence(pred_paths, gt_paths, factors, cfg)
    assert vals[2] < 0.9  # delta1 clearly below perfect


def test_tae_zero_for_consistent_depth(tmp_path):
    """Static camera + identical depths -> TAE == 0."""
    from benchmark.eval.eval_tae import eval_tae_sequence

    rng = np.random.default_rng(2)
    h, w = 48, 60
    depth = rng.random((h, w)) * 5 + 1
    n = 5
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    gt_paths, pred_paths = [], []
    for i in range(n):
        gp = gt_dir / f"{i}.npy"
        pp = pred_dir / f"{i}.npy"
        np.save(gp, depth)
        np.save(pp, (1.0 / depth).astype(np.float32))
        gt_paths.append(str(gp))
        pred_paths.append(str(pp))
    k = np.array([[40.0, 0, w / 2, 0], [0, 40.0, h / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    poses = [np.eye(4)] * n
    tae = eval_tae_sequence(pred_paths, gt_paths, [1.0] * n, [k] * n, poses,
                            crop=(0, h, 0, w), max_depth=10.0,
                            hard_crop=False)
    assert tae < 1e-3
