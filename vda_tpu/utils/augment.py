"""TPU-native clip augmentation for video-depth training.

The reference ships VideoDepthLoss but no training pipeline (SURVEY §3.5);
this implements the standard video-depth recipe — spatially consistent
random-resized-crop + horizontal flip per clip, photometric jitter on the
video only — as ONE jit-able, statically-shaped batch transform.

TPU-first design notes
  * A random-resized crop with a *traced* box cannot use dynamic-shape
    slicing under jit.  Instead crop+resize is ONE bilinear lerp matrix per
    axis, built IN-GRAPH from the random box (the same dense matmul-resize
    formulation as ops/resize, but traced): a hat function
    ``max(0, 1 - |src_i - j|)`` gives exactly the two-tap bilinear weights,
    so the whole transform is two MXU matmuls per clip — no gathers, no
    dynamic shapes, batched with vmap.
  * The SAME box/flip is applied to every frame of a clip and to
    video/depth/mask alike (temporal + cross-modal consistency); photometric
    jitter touches only the video.
  * Depth ground truth and its mask resample by the crop box's NEAREST
    (dominant) tap, not bilinearly — blending across a valid-valid depth
    edge would supervise with depths that exist nowhere in the scene (the
    host loader uses cv2.INTER_NEAREST for the same reason).  The selected
    pixel's own validity is then the exact mask for the target.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _lerp_matrix(in_size: int, out_size: int, lo, hi):
    """(out, in) bilinear weights mapping the traced box [lo, hi] (inclusive
    source coordinates) onto ``out_size`` output rows, align_corners-style:
    ``src_i = lo + i * (hi - lo) / (out - 1)``."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    step = (hi - lo) / max(out_size - 1, 1)
    src = jnp.clip(lo + i * step, 0.0, in_size - 1)          # (out,)
    j = jnp.arange(in_size, dtype=jnp.float32)               # (in,)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - j[None, :]))


def _nearest_matrix(w):
    """0/1 selection matrix taking each output row's DOMINANT tap of the
    lerp matrix — in-graph nearest-neighbor resampling with the same traced
    box.  Depth ground truth must never be blended bilinearly: at a
    valid-valid depth edge interpolation manufactures depths that exist
    nowhere in the scene (the host loader uses cv2.INTER_NEAREST for the
    same reason, apps/train.py load_clip)."""
    return jax.nn.one_hot(jnp.argmax(w, axis=1), w.shape[1], dtype=w.dtype)


def _resample_clip(clip, wy, wx, precision=None):
    """clip: (T, H, W, C) -> (T, out_h, out_w, C) via the two lerp matmuls.

    precision: TPU fp32 einsums run at DEFAULT precision (operands rounded
    to bf16, rel error ~2e-3); supervision targets (depth/mask) pass
    HIGHEST so ground truth is resampled in true fp32."""
    y = jnp.einsum("oh,thwc->towc", wy, clip, precision=precision)
    return jnp.einsum("pw,towc->topc", wx, y, precision=precision)


def _sample_box(key, in_size: int, scale_range):
    """Random crop span along one axis: a length in ``scale_range`` x in_size
    and a uniform offset (the lerp matrix handles up/downscale alike)."""
    k1, k2 = jax.random.split(key)
    lo_s, hi_s = scale_range
    span = (in_size - 1) * jax.random.uniform(k1, (), jnp.float32, lo_s, hi_s)
    start = jax.random.uniform(k2, (), jnp.float32, 0.0,
                               (in_size - 1) - span + 1e-6)
    return start, start + span


def random_resized_crop(key, video, depth, mask, out_hw: Tuple[int, int],
                        scale_range=(0.6, 1.0)):
    """Spatially consistent random-resized-crop of one clip.

    video: (T, H, W, 3); depth/mask: (T, H, W).  Returns the same triple at
    ``out_hw``.  The crop box is shared by all frames and all modalities.
    """
    t, h, w = video.shape[0], video.shape[1], video.shape[2]
    ky, kx = jax.random.split(key)
    y0, y1 = _sample_box(ky, h, scale_range)
    x0, x1 = _sample_box(kx, w, scale_range)
    wy = _lerp_matrix(h, out_hw[0], y0, y1)
    wx = _lerp_matrix(w, out_hw[1], x0, x1)
    video_o = _resample_clip(video, wy, wx)
    # depth AND its validity mask use the SAME nearest (dominant-tap)
    # selection: depth must never be blended across depth edges, and the
    # selected pixel's own validity is then the exact mask for the target.
    # HIGHEST: ground truth resamples in true fp32 (TPU default precision
    # rounds fp32 matmul operands to bf16).
    ny, nx = _nearest_matrix(wy), _nearest_matrix(wx)
    dm = jnp.stack([depth, mask.astype(jnp.float32)], axis=-1)  # (T,H,W,2)
    dm_o = _resample_clip(dm, ny, nx, precision=jax.lax.Precision.HIGHEST)
    return video_o, dm_o[..., 0], dm_o[..., 1] > 0.5


def random_hflip(key, video, depth, mask):
    """Horizontal flip of a whole clip with probability 0.5 (consistent
    across frames and modalities)."""
    flip = jax.random.bernoulli(key, 0.5)

    def f(a):  # W is axis -2 for video (T,H,W,C) after expand; handle both
        axis = -2 if a.ndim == 4 else -1
        return jnp.where(flip, jnp.flip(a, axis=axis), a)

    return f(video), f(depth), f(mask)


def color_jitter(key, video, brightness=0.2, contrast=0.2, saturation=0.2):
    """Per-clip photometric jitter on [0,1] RGB video (video only — depth
    supervision must not change)."""
    kb, kc, ks = jax.random.split(key, 3)
    b = jax.random.uniform(kb, (), jnp.float32,
                           1.0 - brightness, 1.0 + brightness)
    c = jax.random.uniform(kc, (), jnp.float32, 1.0 - contrast, 1.0 + contrast)
    s = jax.random.uniform(ks, (), jnp.float32,
                           1.0 - saturation, 1.0 + saturation)
    v = video * b
    # contrast anchors on the CLIP mean (all of T,H,W,C): a per-frame mean
    # would re-center each frame differently and inject photometric flicker
    # the per-clip factors were chosen to avoid
    mean = jnp.mean(v, axis=(-4, -3, -2, -1), keepdims=True)
    v = mean + (v - mean) * c
    gray = jnp.mean(v, axis=-1, keepdims=True)
    v = gray + (v - gray) * s
    return jnp.clip(v, 0.0, 1.0)


def augment_batch(key, batch: Dict[str, jnp.ndarray],
                  out_hw: Tuple[int, int], scale_range=(0.6, 1.0),
                  jitter=(0.2, 0.2, 0.2)) -> Dict[str, jnp.ndarray]:
    """Augment a training batch {"video" (B,T,H,W,3) in [0,1],
    "depth" (B,T,H,W), "mask" (B,T,H,W)} to spatial size ``out_hw``.

    Jit-able, statically shaped; per-clip randomness via split keys + vmap.
    """
    b = batch["video"].shape[0]
    keys = jax.random.split(key, b)  # (b,) typed or (b, 2) legacy — vmap-safe

    def one(ks, video, depth, mask):
        k0, k1, k2 = jax.random.split(ks, 3)
        video, depth, mask = random_resized_crop(
            k0, video, depth, mask, out_hw, scale_range)
        video, depth, mask = random_hflip(k1, video, depth, mask)
        video = color_jitter(k2, video, *jitter)
        return video, depth, mask

    video, depth, mask = jax.vmap(one)(
        keys, batch["video"], batch["depth"],
        batch["mask"].astype(batch["video"].dtype))
    return {"video": video, "depth": depth, "mask": mask}
