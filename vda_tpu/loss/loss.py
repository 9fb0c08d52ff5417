"""Training loss package, JAX (static shapes, TPU-friendly).

Rebuild of reference loss/loss.py:

  * TrimmedProcrustesLoss = median/MAD-robust-normalized trimmed MAE +
    multi-scale gradient matching, alpha=0.5, 4 scales (reference
    loss.py:98-195)
  * TemporalGradientMatchingLoss: trimmed MAE on temporal differences at
    strides 2^k, masked where the GT temporal gradient exceeds 5% of the
    scene depth range (reference loss.py:198-233)
  * VideoDepthLoss = spatial + 10x stable after per-video scale/shift
    alignment (reference loss.py:236-259)

TPU notes: the reference uses boolean indexing (dynamic shapes) for the
masked median / trimmed sort; here those are masked sorts at static shape —
invalid entries are pushed to +inf and selection uses index arithmetic on the
valid count, so everything jits and shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.inf


def _median_lower(values):
    """Per-row median with torch.median semantics (lower of the two middles).
    values: (B, M).  Returns (B,)."""
    srt = jnp.sort(values, axis=-1)
    idx = (values.shape[-1] - 1) // 2
    return srt[:, idx]


def normalize_prediction_robust(target, mask):
    """Median/abs-dev normalization (reference loss.py:53-71).

    target/mask: (B, H, W).  Returns (normalized, (m, s))."""
    b = target.shape[0]
    flat_t = target.reshape(b, -1)
    flat_m = mask.reshape(b, -1)
    ssum = jnp.sum(flat_m, axis=-1)
    valid = ssum > 0

    # NOTE: the reference medians over the FULL image with invalid pixels
    # zeroed, not over valid pixels only (reference loss.py:61).
    m = jnp.where(valid, _median_lower(flat_t * flat_m), 0.0)
    shifted = target - m[:, None, None]
    sq = jnp.sum(mask * jnp.abs(shifted), axis=(1, 2))
    s = jnp.where(valid, jnp.clip(sq / jnp.maximum(ssum, 1.0), min=1e-6), 1.0)
    return shifted / s[:, None, None], (jax.lax.stop_gradient(m),
                                        jax.lax.stop_gradient(s))


def compute_scale_and_shift(prediction, target, mask):
    """Batched closed-form scale/shift (reference loss.py:74-96).
    All inputs (B, H, W); returns ((B,), (B,))."""
    a_00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(mask * prediction, axis=(1, 2))
    a_11 = jnp.sum(mask, axis=(1, 2))
    b_0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(mask * target, axis=(1, 2))
    det = a_00 * a_11 - a_01 * a_01
    nz = det != 0
    safe = jnp.where(nz, det, 1.0) + 1e-6
    x_0 = jnp.where(nz, (a_11 * b_0 - a_01 * b_1) / safe, 0.0)
    x_1 = jnp.where(nz, (-a_01 * b_0 + a_00 * b_1) / safe, 0.0)
    return x_0, x_1


def trimmed_mae_loss(prediction, target, mask, trim: float = 0.2):
    """Trimmed MAE with batch-based reduction (reference loss.py:135-160).

    Keeps the smallest (1-trim) fraction of masked |residuals| globally;
    static-shape via rank-vs-keep_num masking."""
    m_total = jnp.sum(mask)
    res = jnp.abs((prediction - target) * mask).reshape(-1)
    maskf = (mask > 0).reshape(-1)
    n_valid = jnp.sum(maskf)
    sorted_res = jnp.sort(jnp.where(maskf, res, _INF))
    keep_num = jnp.floor(n_valid.astype(jnp.float32) * (1.0 - trim)) \
        .astype(jnp.int32)
    rank = jnp.arange(sorted_res.shape[0])
    kept = jnp.where(rank < keep_num, sorted_res, 0.0)
    total = jnp.sum(jnp.where(jnp.isfinite(kept), kept, 0.0))
    return jnp.where(m_total > 0, total / jnp.maximum(m_total, 1.0), 0.0)


def _gradient_loss_single(prediction, target, mask, frame_id_mask=None):
    """One-scale gradient matching (reference loss.py:28-51)."""
    m_total = jnp.sum(mask)
    diff = (prediction - target) * mask
    grad_x = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1])
    mask_x = mask[:, :, 1:] * mask[:, :, :-1]
    grad_y = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :])
    mask_y = mask[:, 1:, :] * mask[:, :-1, :]
    if frame_id_mask is not None:
        mask_x = mask_x * (frame_id_mask[:, :, 1:]
                           == frame_id_mask[:, :, :-1]).astype(mask.dtype)
        mask_y = mask_y * (frame_id_mask[:, 1:, :]
                           == frame_id_mask[:, :-1, :]).astype(mask.dtype)
    total = jnp.sum(mask_x * grad_x) + jnp.sum(mask_y * grad_y)
    return jnp.where(m_total > 0, total / jnp.maximum(m_total, 1.0), 0.0)


def gradient_loss(prediction, target, mask, scales: int = 4,
                  num_frame_h: int = 1):
    """Multi-scale gradient loss (reference loss.py:163-195)."""
    frame_id_mask = None
    if num_frame_h > 1:
        h = mask.shape[1]
        frame_h = h // num_frame_h
        ids = jnp.arange(h) // frame_h + 1
        frame_id_mask = jnp.broadcast_to(ids[None, :, None], mask.shape)
    total = 0.0
    for scale in range(scales):
        step = 2 ** scale
        total += _gradient_loss_single(
            prediction[:, ::step, ::step], target[:, ::step, ::step],
            mask[:, ::step, ::step],
            frame_id_mask[:, ::step, ::step]
            if frame_id_mask is not None else None)
    return total


def trimmed_procrustes_loss(prediction, target, mask, alpha: float = 0.5,
                            scales: int = 4, trim: float = 0.2,
                            num_frame_h: int = 1):
    """Spatial loss (reference loss.py:98-124)."""
    pred_n, _ = normalize_prediction_robust(prediction, mask)
    targ_n, _ = normalize_prediction_robust(target, mask)
    total = trimmed_mae_loss(pred_n, targ_n, mask, trim=trim)
    if alpha > 0:
        total = total + alpha * gradient_loss(pred_n, targ_n, mask,
                                              scales=scales,
                                              num_frame_h=num_frame_h)
    return total


def temporal_gradient_matching_loss(prediction, target, mask,
                                    trim: float = 0.2,
                                    temp_grad_scales: int = 1,
                                    temp_grad_decay: float = 0.5,
                                    diff_depth_th: float = 0.05):
    """Stable loss (reference loss.py:198-233).  Inputs (B, T, H, W)."""
    maskb = mask > 0
    min_t = jnp.min(jnp.where(maskb, target, _INF), axis=(-1, -2))
    max_t = jnp.max(jnp.where(maskb, target, -_INF), axis=(-1, -2))
    target_th = (max_t - min_t) * diff_depth_th  # (B, T)

    total, cnt = 0.0, 0
    for scale in range(temp_grad_scales):
        stride = 2 ** scale
        if stride >= prediction.shape[1]:
            continue
        p = prediction[:, ::stride]
        t = target[:, ::stride]
        m = maskb[:, ::stride]
        th = target_th[:, ::stride]
        pg = jnp.diff(p, axis=1)
        tg = jnp.diff(t, axis=1)
        tm = m[:, 1:] & m[:, :-1]
        tm = tm & (jnp.abs(tg) < th[:, 1:, None, None])
        total = total + trimmed_mae_loss(
            pg.reshape(-1, *pg.shape[2:]), tg.reshape(-1, *tg.shape[2:]),
            tm.reshape(-1, *tm.shape[2:]).astype(pg.dtype),
            trim=trim) * (temp_grad_decay ** scale)
        cnt += 1
    return total / max(cnt, 1)


def video_depth_loss(prediction, target, mask, alpha: float = 0.5,
                     scales: int = 4, trim: float = 0.0,
                     stable_scale: float = 10.0):
    """VideoDepthLoss (reference loss.py:236-259).

    prediction/target: (B, T, H, W); mask: (B, T, H, W) bool or {0,1}.
    Returns dict with spatial_loss / stable_loss / total_loss.
    """
    maskf = mask.astype(prediction.dtype)
    b, t, h, w = prediction.shape
    spatial = trimmed_procrustes_loss(
        prediction.reshape(b * t, h, w), target.reshape(b * t, h, w),
        maskf.reshape(b * t, h, w), alpha=alpha, scales=scales, trim=trim)

    scale, shift = compute_scale_and_shift(
        prediction.reshape(b, t * h, w), target.reshape(b, t * h, w),
        maskf.reshape(b, t * h, w))
    aligned = scale[:, None, None, None] * prediction \
        + shift[:, None, None, None]
    stable = temporal_gradient_matching_loss(
        aligned, target, maskf, trim=trim, temp_grad_scales=1,
        temp_grad_decay=0.5) * stable_scale

    return {
        "spatial_loss": spatial,
        "stable_loss": stable,
        "total_loss": spatial + stable,
    }
