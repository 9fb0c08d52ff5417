"""Matmul-based separable image resizing with exact torch / cv2 semantics.

XLA has no builtin for torch's ``F.interpolate(..., align_corners=True)``
(used throughout the reference decoder: dpt.py:156, util/blocks.py:156,
video_depth.py:66,112) nor for cv2.INTER_CUBIC (preprocessing,
video_depth.py:85).  Instead of gather-based interpolation we build the
(out, in) interpolation matrix per axis on the host and apply it as two
matmuls — dense, static, and MXU-friendly.  Weight matrices are cached per
(in, out, mode, convention).

Conventions implemented
  * ``align_corners=True``  : src = dst * (in-1)/(out-1)             (torch)
  * ``align_corners=False`` : src = (dst+0.5)/scale - 0.5            (torch/cv2
    half-pixel; cv2 INTER_CUBIC and torch bicubic use cubic kernel a=-0.75)
Borders replicate-clamp in all cases, matching both torch and cv2.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _src_coords(in_size: int, out_size: int, align_corners: bool,
                scale: float | None) -> np.ndarray:
    d = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            return np.zeros(1)
        return d * (in_size - 1) / (out_size - 1)
    s = scale if scale is not None else out_size / in_size
    return (d + 0.5) / s - 0.5


@functools.lru_cache(maxsize=256)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool,
                   scale: float | None = None) -> np.ndarray:
    """(out, in) float32 bilinear interpolation matrix for one axis."""
    src = _src_coords(in_size, out_size, align_corners, scale)
    src = np.clip(src, 0.0, in_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    m = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), w0)
    np.add.at(m, (rows, i1), w1)
    return m.astype(np.float32)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys); a=-0.75 matches torch & cv2."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def _cubic_matrix(in_size: int, out_size: int, align_corners: bool,
                  scale: float | None = None) -> np.ndarray:
    """(out, in) float32 bicubic interpolation matrix for one axis."""
    src = _src_coords(in_size, out_size, align_corners, scale)
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    m = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    for t in range(-1, 3):
        idx = np.clip(i0 + t, 0, in_size - 1)
        w = _cubic_kernel(t - frac)
        np.add.at(m, (rows, idx), w)
    return m.astype(np.float32)


def _apply_separable(x, mh: np.ndarray, mw: np.ndarray):
    """Apply per-axis (out,in) matrices to NHWC (or HWC / NTHWC) input.

    fp32 inputs contract in fp32 (bit-faithful to torch/cv2).  bf16 inputs
    contract natively on the MXU with fp32 accumulation — the analog of the
    reference running F.interpolate under fp16 autocast.

    MEASURED DEAD ENDS at the vitl island shape (296->518, 128ch, r3):
    (a) band-blocked matmuls exploiting the 2-sparse interpolation matrix
    (5 row blocks x ~85% fewer MACs) — full-window 11.77 vs 11.30 ms/frame:
    the per-block concat materialization outweighs the MAC savings;
    (b) W-pass via transpose sandwich (leading-axis contraction both
    directions) — neutral.  The dense separable einsum stands.
    """
    dtype = x.dtype
    if dtype == jnp.bfloat16:
        # (also measured r3: swapping pass order for upscales — W-middle
        # contraction first on the small H — is WORSE e2e, 357.6 vs 353.8
        # ms window; H-then-W stands)
        a_h = jnp.asarray(mh).astype(jnp.bfloat16)
        a_w = jnp.asarray(mw).astype(jnp.bfloat16)
        y = jnp.einsum("oh,...hwc->...owc", a_h, x,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("pw,...owc->...opc", a_w, y.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return y.astype(dtype)
    a_h = jnp.asarray(mh)
    a_w = jnp.asarray(mw)
    x32 = x.astype(jnp.float32)
    # x: (..., H, W, C): contract H then W.
    y = jnp.einsum("oh,...hwc->...owc", a_h, x32)
    y = jnp.einsum("pw,...owc->...opc", a_w, y)
    return y.astype(dtype)


@functools.lru_cache(maxsize=256)
def _lerp_tables(in_size: int, out_size: int, align_corners: bool,
                 scale: float | None = None):
    """(i0, i1, w1) gather/lerp tables for one axis (same math as
    _linear_matrix, two-tap form)."""
    src = _src_coords(in_size, out_size, align_corners, scale)
    src = np.clip(src, 0.0, in_size - 1)
    i0 = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    return i0, i1, w1


def _lerp_axis(x, axis: int, out_size: int, align_corners: bool, scale):
    i0, i1, w1 = _lerp_tables(x.shape[axis], out_size, align_corners, scale)
    x0 = jnp.take(x, jnp.asarray(i0), axis=axis).astype(jnp.float32)
    x1 = jnp.take(x, jnp.asarray(i1), axis=axis).astype(jnp.float32)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w1).reshape(shape)
    return x0 * (1.0 - w) + x1 * w


def resize_bilinear_gather(x, out_hw, align_corners: bool = True, scale=None):
    """Two-tap gather/lerp bilinear resize — identical math to
    ``resize_bilinear``.

    MEASURED DEAD END on TPU (CLAUDE.md perf log): XLA lowers the jnp.take
    gathers to a scalar loop, ~4x slower than the dense matmul form at the
    296->518 island shape, so no product path uses this.  Kept as the
    equivalence-tested reference for the gather formulation (useful on
    backends with fast gathers)."""
    oh, ow = out_hw
    sh, sw = (scale if scale is not None else (None, None))
    dtype = x.dtype
    y = x
    if oh != x.shape[-3]:
        y = _lerp_axis(y, y.ndim - 3, oh, align_corners, sh)
    if ow != y.shape[-2]:
        y = _lerp_axis(y, y.ndim - 2, ow, align_corners, sw)
    return y.astype(dtype)


def resize_bilinear(x, out_hw, align_corners: bool = True, scale=None):
    """Bilinear resize of NHWC (or any (..., H, W, C)) input.

    align_corners=True matches torch F.interpolate(mode='bilinear',
    align_corners=True) exactly (reference dpt.py:156 etc.).
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (oh, ow) == (h, w) and (align_corners or scale is None):
        return x
    from vda_tpu.ops import pallas_resize  # local: avoids import cycle
    if pallas_resize.supported(x, out_hw, align_corners, scale):
        return pallas_resize.resize_bilinear_fused(x, out_hw)
    sh, sw = (scale if scale is not None else (None, None))
    return _apply_separable(
        x,
        _linear_matrix(h, oh, align_corners, sh),
        _linear_matrix(w, ow, align_corners, sw),
    )


def resize_bicubic(x, out_hw, align_corners: bool = False, scale=None):
    """Bicubic (a=-0.75) resize of (..., H, W, C) input.

    With align_corners=False and scale=None this matches cv2.resize
    INTER_CUBIC (preprocessing, reference video_depth.py:85) and torch
    bicubic half-pixel.  Pass ``scale=(sh, sw)`` to match torch interpolate
    called with an explicit scale_factor (pos-embed interpolation,
    reference dinov2.py:198-205).
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (oh, ow) == (h, w) and scale is None:
        # same-size, no explicit scale: src = (d+0.5)/1 - 0.5 = d (half-pixel)
        # or d*(n-1)/(n-1) = d (align_corners) — the interpolation matrix is
        # exactly identity, so skip the two dense matmuls (the streaming
        # preprocess hits this every frame when input is already at net size)
        return x
    sh, sw = (scale if scale is not None else (None, None))
    return _apply_separable(
        x,
        _cubic_matrix(h, oh, align_corners, sh),
        _cubic_matrix(w, ow, align_corners, sw),
    )
