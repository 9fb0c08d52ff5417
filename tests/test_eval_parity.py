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
