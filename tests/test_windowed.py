"""Windowed driver: closed-form window indices, batching, and mesh fan-out."""

import numpy as np
import pytest

import jax

from vda_tpu.config import INFER_LEN, KEYFRAMES, OVERLAP
from vda_tpu.infer.windowed import window_source_indices, infer_video_depth
from vda_tpu.models import init_video_depth_anything


def _recursive_indices(n_frames):
    """Direct transcription of the reference recursion
    (video_depth.py:92-105) in index space."""
    step = INFER_LEN - OVERLAP
    starts = list(range(0, n_frames, step))
    windows = []
    prev = None
    for s in starts:
        cur = [min(s + i, n_frames - 1) for i in range(INFER_LEN)]
        if prev is not None:
            cur[:OVERLAP] = [prev[k] for k in KEYFRAMES]
        windows.append(cur)
        prev = cur
    return np.asarray(windows)


@pytest.mark.parametrize("n_frames", [5, 22, 32, 40, 100, 111])
def test_window_source_indices_match_reference_recursion(n_frames):
    np.testing.assert_array_equal(window_source_indices(n_frames),
                                  _recursive_indices(n_frames))


def test_window_anchor_is_frame_zero():
    idx = window_source_indices(200)
    assert (idx[:, 0] == 0).all()  # global anchor frame in every window


@pytest.fixture(scope="module")
def tiny_setup(tiny_cfg):
    params = init_video_depth_anything(jax.random.PRNGKey(2), tiny_cfg)
    rng = np.random.default_rng(0)
    frames = (rng.random((50, 70, 90, 3)) * 255).astype(np.uint8)
    return params, frames


def test_window_batch_matches_sequential(tiny_setup, tiny_cfg):
    params, frames = tiny_setup
    d1, _ = infer_video_depth(params, frames, 24, tiny_cfg, input_size=56,
                              fp32=True, window_batch=1)
    d2, _ = infer_video_depth(params, frames, 24, tiny_cfg, input_size=56,
                              fp32=True, window_batch=3)
    np.testing.assert_allclose(d2, d1, rtol=1e-4, atol=1e-5)


def test_progress_reports_fetched_windows(tiny_setup, tiny_cfg):
    """progress() must count host-complete (fetched) windows, monotonic and
    ending at n/n — not async dispatches (the double-buffered driver
    enqueues batch n+1 before batch n's fetch)."""
    params, frames = tiny_setup
    calls = []
    infer_video_depth(params, frames, 24, tiny_cfg, input_size=56,
                      fp32=True, progress=lambda i, n: calls.append((i, n)))
    assert calls, "progress never called"
    ns = {n for _, n in calls}
    assert len(ns) == 1
    n = ns.pop()
    seq = [i for i, _ in calls]
    assert seq == sorted(seq) and seq[-1] == n
    assert all(0 < i <= n for i in seq)


def test_bf16_pipeline_close_to_fp32(tiny_setup, tiny_cfg):
    """The bf16 inference path (bf16 compute + fp16 depth transfer) must stay
    within bf16 noise of the fp32 path end-to-end through stitching."""
    params, frames = tiny_setup
    d32, _ = infer_video_depth(params, frames, 24, tiny_cfg, input_size=56,
                               fp32=True)
    d16, _ = infer_video_depth(params, frames, 24, tiny_cfg, input_size=56,
                               fp32=False)
    scale = max(np.abs(d32).max(), 1e-6)
    rel = np.abs(d16 - d32).max() / scale
    assert rel < 0.1, f"bf16 pipeline deviates {rel:.3f} from fp32"


def test_window_mesh_fanout_matches(tiny_setup, tiny_cfg):
    """Data-parallel window fan-out over a 4-device mesh (virtual CPU)."""
    from vda_tpu.parallel.mesh import make_mesh

    params, frames = tiny_setup
    devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(n_devices=4, tp=1, devices=devices)
    d1, _ = infer_video_depth(params, frames, 24, tiny_cfg, input_size=56,
                              fp32=True, window_batch=1)
    with jax.set_mesh(mesh):
        d4, _ = infer_video_depth(params, frames, 24, tiny_cfg, input_size=56,
                                  fp32=True, window_batch=4, mesh=mesh)
    np.testing.assert_allclose(d4, d1, rtol=1e-4, atol=1e-5)


def test_window_mesh_tensor_parallel_matches(tiny_setup, tiny_cfg):
    """dp=2 x tp=2 inference: params sharded head-aligned over 'model',
    windows over 'data' — output must match the single-device run (GSPMD
    all-reduces differ from the fused single-chip matmuls only by fp32
    reduction order)."""
    from vda_tpu.parallel.mesh import make_mesh

    params, frames = tiny_setup
    devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(n_devices=4, tp=2, devices=devices)
    d1, _ = infer_video_depth(params, frames, 24, tiny_cfg, input_size=56,
                              fp32=True, window_batch=1)
    with jax.set_mesh(mesh):
        dtp, _ = infer_video_depth(params, frames, 24, tiny_cfg,
                                   input_size=56, fp32=True, window_batch=2,
                                   mesh=mesh)
    np.testing.assert_allclose(dtp, d1, rtol=1e-4, atol=1e-5)
