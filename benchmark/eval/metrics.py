"""Depth metrics, numpy (masked per-frame means).

Rebuild of reference benchmark/eval/metric.py (torch) with identical
semantics: every metric zeroes invalid pixels, normalizes per frame by the
valid count, and averages over frames.
"""

from __future__ import annotations

import numpy as np


def _valid_counts(valid_mask, shape):
    if valid_mask is not None:
        return valid_mask.sum(axis=(-1, -2))
    return np.full(shape[:-2], shape[-1] * shape[-2], dtype=np.float64)


def _masked(x, valid_mask):
    if valid_mask is None:
        return x
    out = x.copy()
    out[~valid_mask] = 0
    return out


def abs_relative_difference(output, target, valid_mask=None):
    rel = _masked(np.abs(output - target) / target, valid_mask)
    n = _valid_counts(valid_mask, output.shape)
    return float((rel.sum(axis=(-1, -2)) / n).mean())


def squared_relative_difference(output, target, valid_mask=None):
    rel = _masked(np.abs(output - target) ** 2 / target, valid_mask)
    n = _valid_counts(valid_mask, output.shape)
    return float((rel.sum(axis=(-1, -2)) / n).mean())


def rmse_linear(output, target, valid_mask=None):
    diff2 = _masked(output - target, valid_mask) ** 2
    n = _valid_counts(valid_mask, output.shape)
    return float(np.sqrt(diff2.sum(axis=(-1, -2)) / n).mean())


def rmse_log(output, target, valid_mask=None):
    diff2 = _masked(np.log(output) - np.log(target), valid_mask) ** 2
    n = _valid_counts(valid_mask, output.shape)
    return float(np.sqrt(diff2.sum(axis=(-1, -2)) / n).mean())


def log10(output, target, valid_mask=None):
    if valid_mask is not None:
        diff = np.abs(np.log10(output[valid_mask])
                      - np.log10(target[valid_mask]))
    else:
        diff = np.abs(np.log10(output) - np.log10(target))
    return float(diff.mean())


def threshold_percentage(output, target, threshold_val, valid_mask=None):
    ratio = np.maximum(output / target, target / output)
    bit = (ratio < threshold_val).astype(np.float64)
    if valid_mask is not None:
        bit[~valid_mask] = 0
    n = _valid_counts(valid_mask, output.shape)
    return float((bit.sum(axis=(-1, -2)) / n).mean())


def delta1_acc(pred, gt, valid_mask=None):
    return threshold_percentage(pred, gt, 1.25, valid_mask)


def delta2_acc(pred, gt, valid_mask=None):
    return threshold_percentage(pred, gt, 1.25 ** 2, valid_mask)


def delta3_acc(pred, gt, valid_mask=None):
    return threshold_percentage(pred, gt, 1.25 ** 3, valid_mask)


def i_rmse(output, target, valid_mask=None):
    diff2 = _masked(1.0 / output - 1.0 / target, valid_mask) ** 2
    n = _valid_counts(valid_mask, output.shape)
    return float(np.sqrt(diff2.sum(axis=(-1, -2)) / n).mean())


def silog_rmse(depth_pred, depth_gt, valid_mask=None):
    diff = _masked(np.log(depth_pred) - np.log(depth_gt), valid_mask)
    n = _valid_counts(valid_mask, depth_pred.shape)
    first = (diff ** 2).sum(axis=(-1, -2)) / n
    second = diff.sum(axis=(-1, -2)) ** 2 / n ** 2
    return float(np.sqrt((first - second).mean()) * 100)


METRICS = {
    "abs_relative_difference": abs_relative_difference,
    "squared_relative_difference": squared_relative_difference,
    "rmse_linear": rmse_linear,
    "rmse_log": rmse_log,
    "log10": log10,
    "delta1_acc": delta1_acc,
    "delta2_acc": delta2_acc,
    "delta3_acc": delta3_acc,
    "i_rmse": i_rmse,
    "silog_rmse": silog_rmse,
}
