"""Causal streaming inference with a static-shape hidden-state cache.

Rebuild of reference video_depth_anything/video_depth_stream.py:77-161:

  * first frame: full forward at T=1, then its 8 cache tensors stand in for a
    whole 32-frame window (replication trick, reference :104-121)
  * later frames: encoder on the new frame only; temporal attention queries
    the new frame against a 32-entry KV context assembled from cache entries
    [0:2] + [-(INFER_LEN-3):] (reference :134-140)
  * sliding-window eviction keeps entry 0 (long-range anchor) and drops
    entry 1 once the window has slid past STREAM_GAP (reference :155-160)

TPU-native design: each of the 8 cache slots is ONE device array of shape
(B*H*W, _BUF_ROWS, C) — a fixed-capacity buffer, BHW-major so assembling the
KV context is a transpose-free gather.  Every step runs one jitted function
with fully static shapes: the 31-entry context is a ``jnp.take`` with a
host-computed index vector (the only dynamic data, an int32 (31,) array), and
the new cache row is written with ``.at[:, pos].set``.  No retracing, no
growing Python lists of device arrays.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vda_tpu.config import (
    INFER_LEN,
    STREAM_GAP,
    STREAM_MAX_CACHE,
    ModelConfig,
)
from vda_tpu.models.vda import forward_depth, forward_features
from vda_tpu.utils.transform import (
    compute_resize_hw,
    effective_input_size,
    preprocess_frames,
)

_CTX = INFER_LEN - 1  # 31 context entries
# Rows in the device buffer.  The logical cache holds at most STREAM_MAX_CACHE
# (=42) entries, but within a step the new row is written BEFORE the eviction
# (reference appends at :153 and deletes at :159), so one spare row is needed.
_BUF_ROWS = STREAM_MAX_CACHE + 1


@functools.partial(jax.jit, static_argnames=("cfg", "net_hw", "out_hw", "dtype",
                                             "attn_impl"))
def _first_step(params, frame_u8, cfg: ModelConfig, net_hw, out_hw, dtype,
                attn_impl):
    """First frame: T=1 forward, returns depth + the 8 new cache rows."""
    x = preprocess_frames(frame_u8[None], net_hw, dtype=dtype)[None]
    feats = forward_features(params, x, cfg, attn_impl)
    depth, caches = forward_depth(params, feats, x.shape, cfg)
    from vda_tpu.ops.resize import resize_bilinear
    d = resize_bilinear(depth[0][..., None].astype(jnp.float32), out_hw,
                        align_corners=True)[0, ..., 0]
    return d, [c[:, 0] for c in caches]  # each (BHW, C)


@functools.partial(jax.jit, static_argnames=("cfg", "net_hw", "out_hw", "dtype",
                                             "attn_impl"),
                   donate_argnums=(2,))  # buffers update in place (~600 MB)
def _stream_step(params, frame_u8, buffers, ctx_idx, write_pos,
                 cfg: ModelConfig, net_hw, out_hw, dtype, attn_impl):
    """One causal step.

    buffers: list of 8 arrays (BHW, _BUF_ROWS, C) — BHW-major so the context
    gather needs no transpose.
    ctx_idx: int32 (31,) rows forming the KV context (oldest..newest).
    write_pos: int32 scalar, row to overwrite with the new frame's cache.
    """
    x = preprocess_frames(frame_u8[None], net_hw, dtype=dtype)[None]
    feats = forward_features(params, x, cfg, attn_impl)
    # context assembly as a one-hot contraction, NOT a gather: XLA lowers
    # jnp.take along a middle axis to a scalar gather loop on TPU (measured
    # ~80 ms/step for the 8 buffers); the (31, BUF_ROWS) one-hot matmul reads
    # each buffer once at full HBM bandwidth and rides the MXU (<1 ms).
    sel = jax.nn.one_hot(ctx_idx, _BUF_ROWS, dtype=dtype)  # (31, rows)
    cache_list = [
        jnp.einsum("rt,btc->brc", sel, buf.astype(dtype))  # (BHW, 31, C)
        for buf in buffers
    ]
    depth, new_caches = forward_depth(params, feats, x.shape, cfg,
                                      cached_hidden_state_list=cache_list)
    from vda_tpu.ops.resize import resize_bilinear
    d = resize_bilinear(depth[0][..., None].astype(jnp.float32), out_hw,
                        align_corners=True)[0, ..., 0]
    new_buffers = [
        buf.at[:, write_pos].set(nc[:, 0].astype(buf.dtype))
        for buf, nc in zip(buffers, new_caches)
    ]
    return d, new_buffers


class StreamingDepth:
    """Stateful frame-by-frame depth estimator (reference
    video_depth_stream.py:32-161 ``infer_video_depth_one``)."""

    def __init__(self, params, cfg: ModelConfig, input_size: int = 518,
                 fp32: bool = False, attn_impl: str = "auto"):
        self.params = params
        self.cfg = cfg
        self.input_size = input_size
        self.dtype = jnp.float32 if fp32 else jnp.bfloat16
        self.attn_impl = attn_impl
        self.reset()

    def reset(self):
        self.id = -1
        self.net_hw: Optional[tuple] = None
        self.out_hw: Optional[tuple] = None
        self.buffers: Optional[List[jnp.ndarray]] = None
        # host-side mirror of the reference's frame_cache_list bookkeeping:
        # buffer row index of each live cache entry, in window order
        self.order: List[int] = []
        self.free: List[int] = []

    def __call__(self, frame: np.ndarray) -> np.ndarray:
        """frame: (H, W, 3) uint8 RGB -> depth (H, W) fp32 (synchronous)."""
        return np.asarray(self.submit(frame))

    def submit(self, frame: np.ndarray) -> jax.Array:
        """Asynchronous step: enqueue one frame, return the depth as a DEVICE
        array (fp32, (H, W)) without blocking.

        JAX dispatch is async, so callers can overlap the device compute of
        frame n+1 with fetching frame n's depth (``np.asarray(handle)``) —
        under the tunneled chip this hides the ~10 ms dispatch + transfer
        round-trip per frame.  The cache buffers are donated and never leave
        the device either way.
        """
        self.id += 1
        if self.net_hw is None:
            h, w = frame.shape[:2]
            size = effective_input_size(h, w, self.input_size)
            self.net_hw = compute_resize_hw(h, w, size)
            self.out_hw = (h, w)
            depth, first_rows = _first_step(
                self.params, jnp.asarray(frame), self.cfg, self.net_hw,
                self.out_hw, self.dtype, self.attn_impl)
            # replication trick (reference :118): the first frame's cache is
            # stored once; the first INFER_LEN logical entries all map to row 0
            self.buffers = [
                jnp.zeros((row.shape[0], _BUF_ROWS, row.shape[1]), row.dtype)
                .at[:, 0].set(row)
                for row in first_rows
            ]
            self.order = [0] * INFER_LEN
            self.free = list(range(1, _BUF_ROWS))
            self._slide()
            return depth

        assert frame.shape[:2] == self.out_hw, "frame size changed mid-stream"
        ctx = self.order[0:2] + self.order[-(INFER_LEN - 3):]
        assert len(ctx) == _CTX
        write_pos = self.free[0]
        depth, self.buffers = _stream_step(
            self.params, jnp.asarray(frame), self.buffers,
            jnp.asarray(ctx, jnp.int32), jnp.int32(write_pos),
            self.cfg, self.net_hw, self.out_hw, self.dtype, self.attn_impl)
        self.free.pop(0)
        self.order.append(write_pos)
        self._slide()
        return depth

    def _slide(self):
        """Eviction rule (reference video_depth_stream.py:155-160)."""
        if self.id + INFER_LEN > STREAM_GAP + 1:
            evicted = self.order.pop(1)
            if evicted not in self.order:
                self.free.append(evicted)
