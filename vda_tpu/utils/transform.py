"""Preprocessing: frame -> normalized network input.

The reference preprocesses per frame on the host with cv2
(reference video_depth.py:77-89: /255 -> Resize(lower_bound, keep_aspect,
multiple-of-14, INTER_CUBIC) -> ImageNet normalize -> CHW).  Here the size
policy runs on the host (pure integer math), while the actual resize +
normalize runs on-device, batched over the whole window, as one jitted
matmul-resize stage (BASELINE.json: "resize-to-518 and ImageNet normalization
become an on-device batched preprocessing stage").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vda_tpu.config import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    MAX_ASPECT_RATIO,
    PATCH_SIZE,
)
from vda_tpu.ops.resize import resize_bicubic


def constrain_to_multiple_of(x: float, multiple: int, min_val: int = 0,
                             max_val: int | None = None) -> int:
    """Reference util/transform.py:51-60."""
    y = int(np.round(x / multiple) * multiple)
    if max_val is not None and y > max_val:
        y = int(np.floor(x / multiple) * multiple)
    if y < min_val:
        y = int(np.ceil(x / multiple) * multiple)
    return y


def compute_resize_hw(height: int, width: int, target: int,
                      multiple: int = PATCH_SIZE,
                      method: str = "lower_bound") -> tuple[int, int]:
    """Keep-aspect resize policy (reference util/transform.py:62-107),
    keep_aspect_ratio=True."""
    scale_h = target / height
    scale_w = target / width
    if method == "lower_bound":
        s = max(scale_h, scale_w)
        return (constrain_to_multiple_of(s * height, multiple, min_val=target),
                constrain_to_multiple_of(s * width, multiple, min_val=target))
    if method == "upper_bound":
        s = min(scale_h, scale_w)
        return (constrain_to_multiple_of(s * height, multiple, max_val=target),
                constrain_to_multiple_of(s * width, multiple, max_val=target))
    if method == "minimal":
        s = scale_h if abs(1 - scale_w) >= abs(1 - scale_h) else scale_w
        return (constrain_to_multiple_of(s * height, multiple),
                constrain_to_multiple_of(s * width, multiple))
    raise ValueError(method)


def effective_input_size(height: int, width: int, input_size: int) -> int:
    """Aspect-ratio guard (reference video_depth.py:72-75)."""
    ratio = max(height, width) / min(height, width)
    if ratio > MAX_ASPECT_RATIO:
        input_size = int(input_size * 1.777 / ratio)
        input_size = round(input_size / PATCH_SIZE) * PATCH_SIZE
    return input_size


@functools.partial(jax.jit, static_argnames=("out_hw", "dtype"))
def preprocess_frames(frames_u8, out_hw, dtype=jnp.float32):
    """uint8 (..., H, W, 3) frames -> normalized (..., h, w, 3) in `dtype`.

    Bicubic (a=-0.75, half-pixel) resize matches cv2.INTER_CUBIC; ImageNet
    normalization matches reference util/transform.py:125-136.
    """
    x = frames_u8.astype(jnp.float32) / 255.0
    x = resize_bicubic(x, out_hw)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = (x - mean) / std
    return x.astype(dtype)
