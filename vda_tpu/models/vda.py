"""VideoDepthAnything full model: DINOv2 encoder + temporal DPT head.

Rebuild of reference video_depth_anything/video_depth.py:35-68 and
video_depth_stream.py:32-75 as pure functions.  The offline driver lives in
vda_tpu/infer/windowed.py; the causal streaming driver in
vda_tpu/infer/streaming.py.

x layout: (B, T, H, W, 3) channels-last normalized frames (the reference uses
(B, T, C, H, W); NHWC is the TPU-native conv layout).  Depth output is
(B, T, H, W), non-negative.
"""

from __future__ import annotations

from typing import List, Optional

import jax

from vda_tpu.config import ModelConfig
from vda_tpu.models.dinov2 import encode, init_encoder
from vda_tpu.models.dpt import dpt_head_temporal_apply, init_dpt_head
from vda_tpu.ops.resize import resize_bilinear


def init_video_depth_anything(key, cfg: ModelConfig):
    k1, k2 = jax.random.split(key)
    return {
        "pretrained": init_encoder(k1, cfg.vit),
        "head": init_dpt_head(k2, cfg, temporal=True),
    }


def forward_features(params, x, cfg: ModelConfig, attn_impl: str = "auto",
                     remat: bool = False, drop_path_rate: float = 0.0,
                     rng=None):
    """Encoder taps (reference video_depth_stream.py:65-67).

    x: (B, T, H, W, 3) -> list of 4 (tokens (B*T, N, D), cls (B*T, D)).
    drop_path_rate/rng: stochastic depth for training (models/dinov2.encode).
    """
    b, t, h, w, c = x.shape
    flat = x.reshape(b * t, h, w, c)
    return encode(params["pretrained"], flat, cfg.vit,
                  cfg.intermediate_layer_idx, attn_impl, remat=remat,
                  drop_path_rate=drop_path_rate, rng=rng)


def forward_depth(params, features, x_shape, cfg: ModelConfig,
                  cached_hidden_state_list: Optional[List] = None,
                  micro_batch_size: int = 4, cache_kind: str = "h",
                  need_caches: bool = True, attn_impl: str = "auto"):
    """Head + resize + relu (reference video_depth_stream.py:69-75).

    Returns (depth (B, T, H, W), new_cache_list[8]).  cache_kind="kv"
    switches the cache content to pre-PE K/V projection pairs (streaming
    fast path, see models/dpt.dpt_head_temporal_apply).  need_caches=False
    (offline windows) returns an empty cache list and unlocks the fused
    temporal-block kernel.
    """
    b, t, h, w, _ = x_shape
    patch_hw = (h // cfg.vit.patch_size, w // cfg.vit.patch_size)
    depth, caches = dpt_head_temporal_apply(
        params["head"], features, patch_hw, t, cfg,
        cached_hidden_state_list=cached_hidden_state_list,
        micro_batch_size=micro_batch_size, cache_kind=cache_kind,
        need_caches=need_caches, attn_impl=attn_impl)
    depth = resize_bilinear(depth, (h, w), align_corners=True)
    depth = jax.nn.relu(depth)
    return depth[..., 0].reshape(b, t, h, w), caches


def forward(params, x, cfg: ModelConfig, attn_impl: str = "auto",
            micro_batch_size: int = 4, remat: bool = False,
            drop_path_rate: float = 0.0, rng=None):
    """Full forward (reference video_depth.py:61-68): (B,T,H,W,3) -> (B,T,H,W)."""
    features = forward_features(params, x, cfg, attn_impl, remat=remat,
                                drop_path_rate=drop_path_rate, rng=rng)
    depth, _ = forward_depth(params, features, x.shape, cfg,
                             micro_batch_size=micro_batch_size,
                             need_caches=False, attn_impl=attn_impl)
    return depth
