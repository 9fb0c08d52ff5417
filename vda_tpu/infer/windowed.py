"""Offline windowed inference driver.

Rebuild of reference ``infer_video_depth`` (video_depth.py:70-162), TPU-first:

  * preprocessing (bicubic resize + ImageNet normalize) is one jitted
    on-device stage per window batch, not a per-frame host loop
  * the keyframe-overlap recursion (window n reuses the previous window's
    KEYFRAMES as its first OVERLAP frames, video_depth.py:104-105) is solved
    in closed form: every window's input is a direct gather of SOURCE frames
    (input_w[0] is always source frame 0 — the global anchor — and the other
    overlap slots map to fixed source indices).  Windows are therefore fully
    independent: they batch on one chip (``window_batch``) and shard over the
    data axis of a device mesh (``mesh``) with zero cross-window dependencies
  * only final fp32 depth maps cross back to the host; stitching
    (scale/shift + cross-fade) stays in host fp32 numpy for bit-stability
    (vda_tpu/infer/stitching.py)

Window padding repeats the last frame (video_depth.py:92-95), keeping every
window the same static shape — no retracing.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vda_tpu.config import INFER_LEN, KEYFRAMES, OVERLAP, ModelConfig
from vda_tpu.models.vda import forward
from vda_tpu.infer.stitching import stitch_windows
from vda_tpu.ops.resize import resize_bilinear
from vda_tpu.utils.transform import (
    compute_resize_hw,
    effective_input_size,
    preprocess_frames,
)

FRAME_STEP = INFER_LEN - OVERLAP  # 22


def window_source_indices(n_frames: int) -> np.ndarray:
    """(n_windows, INFER_LEN) source-frame index of every window input slot.

    Derivation: the reference recursion input_w[:OVERLAP] =
    input_{w-1}[KEYFRAMES] (video_depth.py:104-105) bottoms out at source
    frames because KEYFRAMES[0] == 0 (a fixed global anchor) and
    KEYFRAMES[1:] >= OVERLAP (fresh frames of the previous window):

        input_w[0]    = source[0]
        input_w[j]    = source[(w-1)*22 + KEYFRAMES[j]]   for 1 <= j < 10
        input_w[10:]  = source[w*22 + 10 : w*22 + 32]

    Indices past the video end clamp to the last frame (the reference pads by
    repeating it, video_depth.py:92-95).
    """
    n_windows = len(range(0, n_frames, FRAME_STEP))
    idx = np.empty((n_windows, INFER_LEN), np.int64)
    kf = np.asarray(KEYFRAMES, np.int64)
    for w in range(n_windows):
        if w == 0:
            idx[w] = np.arange(INFER_LEN)
        else:
            idx[w, 0] = 0
            idx[w, 1:OVERLAP] = (w - 1) * FRAME_STEP + kf[1:]
            idx[w, OVERLAP:] = w * FRAME_STEP + np.arange(OVERLAP, INFER_LEN)
    return np.minimum(idx, n_frames - 1)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "net_hw", "out_hw", "dtype", "attn_impl",
                     "micro_batch_size"),
)
def _window_batch_step(params, frames_u8, cfg: ModelConfig, net_hw, out_hw,
                       dtype, attn_impl: str, micro_batch_size: int):
    """(W, T, H, W0, 3) uint8 windows -> (W, T, outH, outW) fp32 depths."""
    x = preprocess_frames(frames_u8, net_hw, dtype=dtype)
    depth = forward(params, x, cfg, attn_impl=attn_impl,
                    micro_batch_size=micro_batch_size)
    # final resize in fp32, matching the reference (it casts depth to the
    # fp32 input dtype before F.interpolate, video_depth.py:111-112), then a
    # float16 transfer: halves device->host traffic while keeping fp16's
    # 10-bit mantissa.  The fp16 quantization before host-side stitching is a
    # ~1e-3 relative deviation from the reference's fp32 transfer, covered by
    # the end-to-end bf16-pipeline accuracy test (test_windowed.py).
    d = depth[..., None].astype(jnp.float32)
    d = resize_bilinear(d, out_hw, align_corners=True)
    d = d[..., 0]
    return d if dtype == jnp.float32 else d.astype(jnp.float16)


def infer_video_depth(
    params,
    frames: np.ndarray,
    target_fps: float,
    cfg: ModelConfig,
    input_size: int = 518,
    fp32: bool = False,
    attn_impl: str = "auto",
    window_batch: int = 1,
    mesh=None,
    micro_batch_size: int = 16,  # decoder-tail frames per lax.scan chunk
    progress: Optional[callable] = None,
):
    """frames: (N, H, W, 3) uint8 RGB.  Returns (depths (N, H, W) fp32, fps).

    Matches reference infer_video_depth (video_depth.py:70-162) semantics,
    including the aspect-ratio guard, window padding, keyframe overlap, and
    scale/shift stitching.  ``fp32=False`` runs the network in bfloat16
    (the TPU analog of the reference's fp16 autocast, video_depth.py:107-109).

    window_batch > 1 batches independent windows into one forward for higher
    chip utilization; with ``mesh`` (a ('data','model') jax Mesh) the window
    batch is sharded over the data axis (set window_batch to a multiple of
    the data-parallel degree).

    A mesh with a model axis > 1 additionally runs the network
    TENSOR-PARALLEL: params are converted to the head-aligned TP layout
    (parallel/mesh.to_tp_layout) and sharded by the Megatron rules in
    parallel/mesh.param_shardings — each chip holds whole attention heads
    and MLP hidden slices, GSPMD inserts the standard 2-collective
    all-reduce pattern (asserted from compiled HLO in
    tests/test_parallel_integration.py).  This is for latency (one window
    spread over tp chips) and for fitting vitg-scale encoders in smaller
    per-chip HBM; pure window fan-out (tp=1) is the throughput mode.
    Under tp the attention kernels fall back to attn_impl="xla" (Pallas
    kernels are single-chip programs GSPMD cannot partition) and the
    decoder-tail scan chunking is disabled (chunking a sharded batch dim
    would force per-chunk resharding — same rationale as
    parallel/train.make_train_step).
    """
    n_frames, frame_h, frame_w = frames.shape[:3]
    size = effective_input_size(frame_h, frame_w, input_size)
    net_hw = compute_resize_hw(frame_h, frame_w, size)
    dtype = jnp.float32 if fp32 else jnp.bfloat16

    idx = window_source_indices(n_frames)
    n_windows = idx.shape[0]
    wb = max(1, min(window_batch, n_windows))

    data_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from vda_tpu.parallel.mesh import (
            DATA_AXIS,
            MODEL_AXIS,
            param_shardings,
            to_tp_layout,
        )

        data_sharding = NamedSharding(mesh, P(DATA_AXIS))
        dp = mesh.shape[DATA_AXIS]
        wb = -(-wb // dp) * dp  # window batch must fill the data axis
        if dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
            # tensor-parallel: head-aligned qkv shards + Megatron partition
            # specs; XLA attention (Pallas kernels are not partitionable);
            # full-batch decoder tail (no scan over the sharded window dim)
            params = to_tp_layout(params)
            cfg = cfg.replace(tp_layout=True)
            attn_impl = "xla"
            micro_batch_size = wb * INFER_LEN
            params = jax.device_put(params, param_shardings(params, mesh))

    # Double-buffered dispatch: batch n+1 is enqueued BEFORE batch n's
    # device->host fetch, so transfer overlaps compute (JAX dispatch is
    # async; only np.asarray blocks).  At most two batches are in flight,
    # bounding HBM regardless of video length.
    depth_batches = []
    done_windows = 0
    pending = None  # (device depths, n_valid windows)

    def _fetch(dev, n_valid):
        nonlocal done_windows
        depth_batches.append(np.asarray(dev[:n_valid]).astype(np.float32))
        # progress counts FETCHED (host-complete) windows, not async
        # dispatches — with double buffering a dispatched batch may still be
        # computing when the next one is enqueued
        done_windows += n_valid
        if progress is not None:
            progress(done_windows, n_windows)

    for start in range(0, n_windows, wb):
        batch_idx = idx[start:start + wb]
        n_valid = batch_idx.shape[0]
        if n_valid < wb:  # pad batch to keep the jit shape static
            pad = wb - n_valid
            batch_idx = np.concatenate([batch_idx, batch_idx[-1:].repeat(pad, 0)])
        window_u8 = jnp.asarray(frames[batch_idx])  # (wb, 32, H, W, 3)
        if data_sharding is not None:
            window_u8 = jax.device_put(window_u8, data_sharding)
        d = _window_batch_step(params, window_u8, cfg, net_hw,
                               (frame_h, frame_w), dtype, attn_impl,
                               micro_batch_size)
        if pending is not None:
            _fetch(*pending)
        pending = (d, n_valid)
    if pending is not None:
        _fetch(*pending)

    host_depths = []
    for arr in depth_batches:
        host_depths.extend(list(arr.reshape(-1, *arr.shape[2:])))
    aligned = stitch_windows(host_depths, metric=cfg.metric)
    return np.stack(aligned[:n_frames], axis=0), target_fps
