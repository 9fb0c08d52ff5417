"""Offline windowed inference driver.

Rebuild of reference ``infer_video_depth`` (video_depth.py:70-162), TPU-first:

  * preprocessing (bicubic resize + ImageNet normalize) is one jitted
    on-device stage over the whole 32-frame window, not a per-frame host loop
  * the keyframe-overlap substitution (window n reuses the previous window's
    KEYFRAMES as its first OVERLAP frames, video_depth.py:104-105) is a static
    device-side gather
  * the forward pass and the depth->source-resolution resize run under one
    jit; only final fp32 depth maps cross back to the host
  * JAX dispatch is async, so host-side stitching and video decode of window
    n+1 overlap device compute of window n for free
  * stitching (scale/shift + cross-fade) stays in host fp32 numpy for
    bit-stability (vda_tpu/infer/stitching.py)

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

_KEYFRAMES = np.asarray(KEYFRAMES, np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "net_hw", "out_hw", "dtype", "use_prev", "attn_impl"),
)
def _window_step(params, frames_u8, prev_input, cfg: ModelConfig, net_hw,
                 out_hw, dtype, use_prev: bool, attn_impl: str):
    """One window: preprocess -> keyframe substitution -> forward -> resize.

    frames_u8: (T, H, W, 3) uint8.  Returns (depth (T, outH, outW) fp32,
    cur_input (1, T, h, w, 3) network input for the next window's overlap).
    """
    x = preprocess_frames(frames_u8, net_hw, dtype=dtype)[None]  # (1,T,h,w,3)
    if use_prev:
        kf = jnp.take(prev_input, jnp.asarray(_KEYFRAMES), axis=1)
        x = jnp.concatenate([kf, x[:, OVERLAP:]], axis=1)
    depth = forward(params, x, cfg, attn_impl=attn_impl,
                    micro_batch_size=16)  # 16-frame decoder chunks fit v5e HBM
    d = depth[0][..., None].astype(jnp.float32)                 # (T,h,w,1)
    d = resize_bilinear(d, out_hw, align_corners=True)
    return d[..., 0], x


def infer_video_depth(
    params,
    frames: np.ndarray,
    target_fps: float,
    cfg: ModelConfig,
    input_size: int = 518,
    fp32: bool = False,
    attn_impl: str = "auto",
    progress: Optional[callable] = None,
):
    """frames: (N, H, W, 3) uint8 RGB.  Returns (depths (N, H, W) fp32, fps).

    Matches reference infer_video_depth (video_depth.py:70-162) semantics,
    including the aspect-ratio guard, window padding, keyframe overlap, and
    scale/shift stitching.  ``fp32=False`` runs the network in bfloat16
    (the TPU analog of the reference's fp16 autocast, video_depth.py:107-109).
    """
    n_frames, frame_h, frame_w = frames.shape[:3]
    size = effective_input_size(frame_h, frame_w, input_size)
    net_hw = compute_resize_hw(frame_h, frame_w, size)
    dtype = jnp.float32 if fp32 else jnp.bfloat16

    frame_step = INFER_LEN - OVERLAP
    append_len = ((frame_step - n_frames % frame_step) % frame_step
                  + (INFER_LEN - frame_step))
    idx = np.concatenate([np.arange(n_frames),
                          np.full(append_len, n_frames - 1, np.int64)])

    depth_list = []
    prev_input = None
    window_starts = list(range(0, n_frames, frame_step))
    for wi, start in enumerate(window_starts):
        window_u8 = frames[idx[start:start + INFER_LEN]]
        use_prev = prev_input is not None
        if prev_input is None:
            # constant placeholder so the jitted signature stays fixed
            prev_input = jnp.zeros((1, INFER_LEN, *net_hw, 3), dtype)
        d, prev_input = _window_step(
            params, jnp.asarray(window_u8), prev_input, cfg, net_hw,
            (frame_h, frame_w), dtype, use_prev, attn_impl)
        depth_list.append(d)
        if progress is not None:
            progress(wi + 1, len(window_starts))

    # device -> host once per window; stitching in fp32 numpy
    host_depths = []
    for d in depth_list:
        host_depths.extend(list(np.asarray(d)))
    aligned = stitch_windows(host_depths, metric=cfg.metric)
    return np.stack(aligned[:n_frames], axis=0), target_fps
