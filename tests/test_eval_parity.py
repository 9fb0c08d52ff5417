"""Benchmark evaluation parity: our eval_sequence vs the reference
eval_depthcrafter on identical synthetic predictions/GT."""

import argparse
import importlib.util
import sys

import numpy as np
import pytest

from tests.conftest import requires_torch

pytestmark = requires_torch


def _load_ref_eval():
    # reference eval.py does `from metric import *`; make its dir importable
    path = "/root/reference/benchmark/eval"
    if path not in sys.path:
        sys.path.append(path)
    spec = importlib.util.spec_from_file_location(
        "ref_eval", "/root/reference/benchmark/eval/eval.py")
    mod = importlib.util.module_from_spec(spec)
    # the reference pins device='cuda' at module level; evaluate on cpu
    src = open("/root/reference/benchmark/eval/eval.py").read()
    src = src.replace("device = 'cuda'", "device = 'cpu'")
    code = compile(src, "/root/reference/benchmark/eval/eval.py", "exec")
    exec(code, mod.__dict__)
    return mod


def _load_ref_tae():
    spec = importlib.util.spec_from_file_location(
        "ref_tae_full", "/root/reference/benchmark/eval/eval_tae.py")
    mod = importlib.util.module_from_spec(spec)
    src = open("/root/reference/benchmark/eval/eval_tae.py").read()
    src = src.replace(
        "device = torch.device('cuda' if torch.cuda.is_available() else 'cpu')",
        "device = torch.device('cpu')")
    exec(compile(src, "ref_tae", "exec"), mod.__dict__)
    return mod


def test_eval_tae_sequence_matches_reference(tmp_path):
    """Full-sequence TAE (disparity alignment + bidirectional reprojection)
    vs reference eval_TAE on identical synthetic data with real motion."""
    ref_tae = _load_ref_tae()

    from benchmark.eval.eval_tae import eval_tae_sequence

    rng = np.random.default_rng(2)
    n, h, w = 6, 48, 64
    crop = (4, -4, 5, -5)
    k = np.array([[60.0, 0, w / 2, 0], [0, 60.0, h / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    gt_paths, pred_paths, factors, ks, poses = [], [], [], [], []
    base = rng.random((h, w)) * 6 + 0.5
    for i in range(n):
        depth_m = base + 0.05 * rng.random((h, w))
        pred = 1.8 / depth_m[4:-4, 5:-5] + 0.02 \
            + rng.normal(0, 0.01, (h - 8, w - 10))
        gp = tmp_path / f"g{i}.npy"
        pp = tmp_path / f"p{i}.npy"
        np.save(gp, (depth_m * 1000).astype(np.uint16))
        np.save(pp, pred.astype(np.float32))
        gt_paths.append(str(gp))
        pred_paths.append(str(pp))
        factors.append(1000.0)
        ks.append(k)
        theta = 0.01 * i
        pose = np.eye(4)
        pose[:3, :3] = [[np.cos(theta), -np.sin(theta), 0],
                        [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
        pose[:3, 3] = [0.02 * i, 0.01 * i, 0.03 * i]
        poses.append(pose)

    args = argparse.Namespace(max_depth_eval=10.0, min_depth_eval=0.1,
                              a=4, b=-4, c=5, d=-5, mask=False,
                              hard_crop=False)
    ref_val = ref_tae.eval_TAE(pred_paths, gt_paths, factors, [], ks, poses,
                               args)
    our_val = eval_tae_sequence(pred_paths, gt_paths, factors, ks, poses,
                                crop=crop, max_depth=10.0, hard_crop=False)
    np.testing.assert_allclose(our_val, float(ref_val), rtol=1e-5)


def test_eval_sequence_matches_reference(tmp_path):
    ref_eval = _load_ref_eval()

    from benchmark.eval.eval import DATASET_CONFIGS, eval_sequence

    rng = np.random.default_rng(0)
    n, h, w = 10, 64, 80
    crop = (8, -8, 11, -11)
    gt_paths, pred_paths, factors = [], [], []
    for i in range(n):
        depth_m = rng.random((h, w)) * 8 + 0.3
        # imperfect prediction: affine disparity + noise
        pred = 2.0 / depth_m[8:-8, 11:-11] + 0.05 \
            + rng.normal(0, 0.02, (h - 16, w - 22))
        gp = tmp_path / f"gt_{i}.npy"
        pp = tmp_path / f"pred_{i}.npy"
        np.save(gp, (depth_m * 1000).astype(np.uint16))  # factor-1000 ints
        np.save(pp, pred.astype(np.float32))
        gt_paths.append(str(gp))
        pred_paths.append(str(pp))
        factors.append(1000.0)

    args = argparse.Namespace(max_eval_len=90, max_depth_eval=10.0,
                              min_depth_eval=0.1, a=8, b=-8, c=11, d=-11)
    ref_vals = ref_eval.eval_depthcrafter(pred_paths, gt_paths, factors, args)

    cfg = DATASET_CONFIGS["scannet"]
    our_vals = eval_sequence(pred_paths, gt_paths, factors, cfg)

    # [abs_rel, rmse, delta1]
    np.testing.assert_allclose(our_vals, ref_vals, rtol=1e-6,
                               err_msg=f"ours={our_vals} ref={ref_vals}")
