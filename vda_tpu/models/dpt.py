"""DPT decoder head (spatial + temporal variants), functional JAX.

Rebuild of reference video_depth_anything/dpt.py, dpt_temporal.py and
util/blocks.py:

  * 4x 1x1 conv projections + resize layers (4x/2x "deconv", identity,
    stride-2 conv) — reference dpt.py:60-90.  The k==stride deconvs are
    expressed as a single matmul+reshape (ops.conv_transpose_same_stride).
  * _make_scratch 3x3 convs (no bias) — reference util/blocks.py:4-34
  * FeatureFusionBlock with ResidualConvUnits and bilinear align_corners=True
    upsampling — reference util/blocks.py:94-162
  * output head conv1 -> bilinear to (14*ph, 14*pw) -> conv2 stack, with the
    conv2 stack forced to fp32 exactly like the reference's disabled-autocast
    island (reference dpt_temporal.py:105-108)
  * DPTHeadTemporal: four TemporalModules at layer_3, layer_4, after
    refinenet4 and after refinenet3 (reference dpt_temporal.py:42-51, 79-94),
    streaming-cache threading, and micro-batching of the high-resolution tail
    via lax.scan (reference dpt_temporal.py:96-123 uses a Python loop; a scan
    keeps the XLA graph compact and the working set bounded on TPU)

Layout: NHWC throughout; tokens arrive (B*T, N, D) from the encoder.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from vda_tpu.config import ModelConfig
from vda_tpu.models.temporal import init_temporal_module, temporal_module_apply
from vda_tpu.ops.layers import (
    conv2d,
    conv_transpose_same_stride,
    init_conv2d,
    init_conv_transpose,
)
from vda_tpu.ops.resize import resize_bilinear


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_rcu(key, f):
    k1, k2 = jax.random.split(key)
    return {"conv1": init_conv2d(k1, 3, f, f), "conv2": init_conv2d(k2, 3, f, f)}


def _init_fusion(key, f):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "rcu1": _init_rcu(k1, f),
        "rcu2": _init_rcu(k2, f),
        "out_conv": init_conv2d(k3, 1, f, f),
    }


def init_dpt_head(key, cfg: ModelConfig, temporal: bool = True):
    d = cfg.vit.embed_dim
    f = cfg.features
    oc = cfg.out_channels
    keys = jax.random.split(key, 24)
    p = {
        "projects": [init_conv2d(keys[i], 1, d, oc[i]) for i in range(4)],
        "resize0": init_conv_transpose(keys[4], 4, oc[0], oc[0]),
        "resize1": init_conv_transpose(keys[5], 2, oc[1], oc[1]),
        "resize3": init_conv2d(keys[6], 3, oc[3], oc[3]),
        "scratch": {
            f"layer{i+1}_rn": init_conv2d(keys[7 + i], 3, oc[i], f, bias=False)
            for i in range(4)
        },
        "refinenet1": _init_fusion(keys[11], f),
        "refinenet2": _init_fusion(keys[12], f),
        "refinenet3": _init_fusion(keys[13], f),
        "refinenet4": _init_fusion(keys[14], f),
        "output_conv1": init_conv2d(keys[15], 3, f, f // 2),
        "output_conv2": {
            "conv0": init_conv2d(keys[16], 3, f // 2, 32),
            "conv1": init_conv2d(keys[17], 1, 32, 1),
        },
    }
    # bias the final pre-ReLU conv positive so a randomly initialized model
    # produces nonzero depth (torch's uniform init leaves ~50% of seeds with
    # an all-dead output ReLU); loaded checkpoints overwrite this anyway
    p["output_conv2"]["conv1"]["b"] = jnp.abs(p["output_conv2"]["conv1"]["b"]) + 0.1
    if temporal:
        p["motion_modules"] = [
            init_temporal_module(keys[18], oc[2], cfg),
            init_temporal_module(keys[19], oc[3], cfg),
            init_temporal_module(keys[20], f, cfg),
            init_temporal_module(keys[21], f, cfg),
        ]
    return p


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _rcu(p, x):
    """ResidualConvUnit (reference util/blocks.py:68-91)."""
    out = jax.nn.relu(x)
    out = conv2d(p["conv1"], out, padding=1)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out, padding=1)
    return out + x


def _fusion(p, x, res=None, size=None, apply_out_conv=True):
    """FeatureFusionBlock (reference util/blocks.py:135-162).

    apply_out_conv=False returns the pre-out_conv tensor so the caller can
    fold the 1x1 out_conv into a following conv (see ``_fold_out_conv1``).
    """
    out = x
    if res is not None:
        out = out + _rcu(p["rcu1"], res)
    out = _rcu(p["rcu2"], out)
    if size is None:
        size = (out.shape[1] * 2, out.shape[2] * 2)
    out = resize_bilinear(out, size, align_corners=True)
    if not apply_out_conv:
        return out
    return conv2d(p["out_conv"], out, padding=0)


def _fold_out_conv1(p_out_conv, p_oc1, x):
    """refinenet1's 1x1 out_conv folded into the 3x3 output_conv1.

    conv3x3(W2) ∘ conv1x1(W1) == conv3x3(W1 · W2), which removes a full
    256-channel 296^2 intermediate (~1.4 GB HBM round trip at the vitl
    window) and the 1x1 conv's 184 G MACs.  The 1x1 bias does NOT survive
    the fold at image borders (the 3x3 conv's zero padding must see y=0,
    not b1): its valid-tap contribution is restored by a 1-channel mask
    conv, so the result is border-exact.  Weight fold happens in fp32.
    """
    w1 = p_out_conv["w"][0, 0].astype(jnp.float32)        # (C, C)
    b1 = p_out_conv["b"].astype(jnp.float32)              # (C,)
    w2 = p_oc1["w"].astype(jnp.float32)                   # (3,3,C,F)
    wf = jnp.einsum("ic,hwcf->hwif", w1, w2).astype(x.dtype)
    bk = jnp.einsum("c,hwcf->hwf", b1, w2)[:, :, None, :]  # (3,3,1,F) fp32
    y = jax.lax.conv_general_dilated(
        x, wf, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), jnp.float32)
    corr = jax.lax.conv_general_dilated(
        ones, bk, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + (corr + p_oc1["b"].astype(jnp.float32)).astype(y.dtype)


def _project_and_resize(p, features, patch_hw):
    """Token taps -> four feature pyramids (reference dpt.py:126-141)."""
    ph, pw = patch_hw
    out = []
    for i, (tokens, _cls) in enumerate(features):
        bt, n, d = tokens.shape
        x = tokens.reshape(bt, ph, pw, d)
        x = conv2d(p["projects"][i], x, padding=0)
        if i == 0:
            x = conv_transpose_same_stride(p["resize0"], x, 4)
        elif i == 1:
            x = conv_transpose_same_stride(p["resize1"], x, 2)
        elif i == 3:
            x = conv2d(p["resize3"], x, stride=2, padding=1)
        out.append(x)
    return out


def _output_tail(p, path_3, layer_2_rn, layer_1_rn, out_hw):
    """refinenet2/1 + output convs; conv2 stack in fp32
    (reference dpt_temporal.py:98-108)."""
    path_2 = _fusion(p["refinenet2"], path_3, layer_2_rn,
                     size=layer_1_rn.shape[1:3])
    if path_3.dtype == jnp.bfloat16:
        # bf16 perf path: fold refinenet1's 1x1 out_conv into output_conv1
        # (saves the 256-ch intermediate round trip; border-exact, fp32 fold)
        pre = _fusion(p["refinenet1"], path_2, layer_1_rn,
                      apply_out_conv=False)
        out = _fold_out_conv1(p["refinenet1"]["out_conv"],
                              p["output_conv1"], pre)
    else:
        path_1 = _fusion(p["refinenet1"], path_2, layer_1_rn)
        out = conv2d(p["output_conv1"], path_1, padding=1)
    out = resize_bilinear(out, out_hw, align_corners=True)
    ori_dtype = out.dtype
    if (ori_dtype == jnp.bfloat16 and out_hw[0] % 2 == 0
            and out_hw[1] % 2 == 0):
        # fp32 island, TPU form: fp32 convs are MXU-emulated at ~16 TF/s
        # (6-pass), ~10% of a vitl window.  The island's purpose is fp32
        # ACCUMULATION over the 9x128 conv sums — the input here is already
        # bf16-precision (it came through the bf16 pipeline), so bf16
        # operands + fp32 accumulation + fp32 elementwise preserve it at
        # MXU-native speed.
        #
        # Additionally, both island convs have tiny output-channel counts
        # (32 then 1) which strand 3/4 of the MXU lanes, so they run in the
        # 2x2-block space-to-depth form (ops/layers._s2d_weight): conv0 as a
        # stride-2 conv with full 128-lane output, conv1 as a block-diagonal
        # (128, 4) matmul on the blocked layout, and only the final
        # 4-channel result is depth-to-spaced (1/32 the bytes of unblocking
        # conv0's output).  Bit-identical math, ~2x faster island.
        from vda_tpu.ops.layers import _s2d_weight

        b, oh, ow = out.shape[0], out_hw[0], out_hw[1]
        c0, c1 = p["output_conv2"]["conv0"], p["output_conv2"]["conv1"]
        y2 = jax.lax.conv_general_dilated(
            out, _s2d_weight(c0["w"].astype(out.dtype)),
            window_strides=(2, 2), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)       # (B, H/2, W/2, 4*32)
        y2 = jax.nn.relu(y2 + jnp.tile(c0["b"].astype(jnp.float32), 4))
        # blocked 1x1 conv: (4*32 -> 4), block-diagonal kron(I4, w1)
        w1 = c1["w"][0, 0, :, 0].astype(jnp.float32)  # (32,)
        w1b = jnp.kron(jnp.eye(4, dtype=jnp.float32), w1[:, None])  # (128, 4)
        z = jax.nn.relu(jnp.matmul(y2, w1b) + c1["b"].astype(jnp.float32))
        z = z.reshape(b, oh // 2, ow // 2, 2, 2, 1)
        out32 = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, oh, ow, 1)
        return out32.astype(ori_dtype)
    if ori_dtype == jnp.bfloat16:
        out32 = jax.nn.relu(conv2d(p["output_conv2"]["conv0"], out, padding=1,
                                   accumulate_fp32=True))  # fp32 out + bias
        out32 = jax.nn.relu(conv2d(p["output_conv2"]["conv1"], out32,
                                   padding=0))
        return out32.astype(ori_dtype)
    out32 = out.astype(jnp.float32)
    out32 = jax.nn.relu(conv2d(p["output_conv2"]["conv0"], out32, padding=1))
    out32 = jax.nn.relu(conv2d(p["output_conv2"]["conv1"], out32, padding=0))
    return out32.astype(ori_dtype)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def dpt_head_spatial_apply(p, features, patch_hw):
    """Plain DPTHead forward (reference dpt.py:126-159).  Returns
    (B, 14*ph, 14*pw, 1)."""
    ph, pw = patch_hw
    layer_1, layer_2, layer_3, layer_4 = _project_and_resize(p, features, patch_hw)
    l1 = conv2d(p["scratch"]["layer1_rn"], layer_1, padding=1)
    l2 = conv2d(p["scratch"]["layer2_rn"], layer_2, padding=1)
    l3 = conv2d(p["scratch"]["layer3_rn"], layer_3, padding=1)
    l4 = conv2d(p["scratch"]["layer4_rn"], layer_4, padding=1)
    path_4 = _fusion(p["refinenet4"], l4, size=l3.shape[1:3])
    path_3 = _fusion(p["refinenet3"], path_4, l3, size=l2.shape[1:3])
    return _output_tail(p, path_3, l2, l1, (ph * 14, pw * 14))


def _with_temporal(p_mm, x, cfg, frame_length, cache, want_kv=False,
                   need_caches=True, attn_impl="auto"):
    """Run a TemporalModule on (B*T, h, w, C) features."""
    bt, hh, ww, c = x.shape
    b = bt // frame_length
    xt = x.reshape(b, frame_length, hh, ww, c)
    yt, new_cache = temporal_module_apply(p_mm, xt, cfg, cache,
                                          want_kv=want_kv,
                                          need_caches=need_caches,
                                          attn_impl=attn_impl)
    return yt.reshape(bt, hh, ww, c), new_cache


def dpt_head_temporal_stage(
    p,
    features,
    patch_hw: Tuple[int, int],
    frame_length: int,
    cfg: ModelConfig,
    cached_hidden_state_list: Optional[List] = None,
    cache_kind: str = "h",
    need_caches: bool = True,
    attn_impl: str = "auto",
):
    """Cache-coupled front of DPTHeadTemporal (reference dpt_temporal.py:
    53-123 up to the refinenet3 output).

    Everything that reads or writes the temporal cache lives here: tap
    projections, the four TemporalModules, the rn convs, and refinenets 4/3
    (all at <= 74x74 resolution).  Returns ((path_3, l2, l1), new_cache_list)
    — the inputs of ``dpt_head_temporal_tail``.  The split exists for
    streaming group mode (infer/streaming._stream_step_group): per-frame
    causality flows ONLY through the cache, so k frames must run this stage
    sequentially but can share ONE batched tail (the tail is ~2/3 of the
    head's cost and runs at 148^2..518^2 where batch-1 under-utilizes the
    chip).
    """
    ph, pw = patch_hw
    n_mm = len(p["motion_modules"])
    n_cache = 0
    if cached_hidden_state_list is not None:
        n_cache = len(cached_hidden_state_list) // n_mm

    def cache_slice(i):
        if not n_cache:
            return None
        return cached_hidden_state_list[i * n_cache:(i + 1) * n_cache]

    layer_1, layer_2, layer_3, layer_4 = _project_and_resize(p, features, patch_hw)

    want_kv = cache_kind == "kv"
    layer_3, h0 = _with_temporal(p["motion_modules"][0], layer_3, cfg,
                                 frame_length, cache_slice(0), want_kv,
                                 need_caches, attn_impl)
    layer_4, h1 = _with_temporal(p["motion_modules"][1], layer_4, cfg,
                                 frame_length, cache_slice(1), want_kv,
                                 need_caches, attn_impl)

    l1 = conv2d(p["scratch"]["layer1_rn"], layer_1, padding=1)
    l2 = conv2d(p["scratch"]["layer2_rn"], layer_2, padding=1)
    l3 = conv2d(p["scratch"]["layer3_rn"], layer_3, padding=1)
    l4 = conv2d(p["scratch"]["layer4_rn"], layer_4, padding=1)

    path_4 = _fusion(p["refinenet4"], l4, size=l3.shape[1:3])
    path_4, h2 = _with_temporal(p["motion_modules"][2], path_4, cfg,
                                frame_length, cache_slice(2), want_kv,
                                need_caches, attn_impl)
    path_3 = _fusion(p["refinenet3"], path_4, l3, size=l2.shape[1:3])
    path_3, h3 = _with_temporal(p["motion_modules"][3], path_3, cfg,
                                frame_length, cache_slice(3), want_kv,
                                need_caches, attn_impl)
    return (path_3, l2, l1), h0 + h1 + h2 + h3


def dpt_head_temporal_tail(p, stage_out, patch_hw: Tuple[int, int],
                           micro_batch_size: int = 4):
    """Per-frame-independent back of DPTHeadTemporal: refinenet2/1 + output
    convs (reference dpt_temporal.py:96-123).  stage_out is
    ``dpt_head_temporal_stage``'s (path_3, l2, l1); batch is B*T.  Chunks the
    batch through a lax.scan when it divides micro_batch_size (bounds the
    518^2 intermediates' working set at offline window sizes)."""
    path_3, l2, l1 = stage_out
    ph, pw = patch_hw
    out_hw = (ph * 14, pw * 14)
    batch = l1.shape[0]
    if batch <= micro_batch_size or batch % micro_batch_size != 0:
        return _output_tail(p, path_3, l2, l1, out_hw)
    mb = micro_batch_size
    nc = batch // mb

    def chunk(x):
        return x.reshape(nc, mb, *x.shape[1:])

    def body(_, xs):
        p3, x2, x1 = xs
        return None, _output_tail(p, p3, x2, x1, out_hw)

    _, depth = jax.lax.scan(body, None, (chunk(path_3), chunk(l2), chunk(l1)))
    return depth.reshape(batch, *depth.shape[2:])


def dpt_head_temporal_apply(
    p,
    features,
    patch_hw: Tuple[int, int],
    frame_length: int,
    cfg: ModelConfig,
    cached_hidden_state_list: Optional[List] = None,
    micro_batch_size: int = 4,
    cache_kind: str = "h",
    need_caches: bool = True,
    attn_impl: str = "auto",
):
    """DPTHeadTemporal forward (reference dpt_temporal.py:53-125).

    features: list of 4 (tokens (B*T, N, D), cls) taps, T == frame_length
    (number of NEW frames; 32 offline, 1 streaming).
    Returns (depth (B*T, 14*ph, 14*pw, 1), new_cache_list[8]).

    cache_kind: "h" returns/consumes pre-PE hidden states (the reference's
    cache, dpt_temporal.py:74-93); "kv" returns/consumes (k, v) pre-PE
    projection tuples (streaming fast path, models/temporal.py
    ``_temporal_attention_kv``).  need_caches=False (offline windows, where
    the caller discards the cache) unlocks the fused temporal-block kernel
    and returns an empty cache list.
    """
    stage_out, caches = dpt_head_temporal_stage(
        p, features, patch_hw, frame_length, cfg,
        cached_hidden_state_list=cached_hidden_state_list,
        cache_kind=cache_kind, need_caches=need_caches,
        attn_impl=attn_impl)
    depth = dpt_head_temporal_tail(p, stage_out, patch_hw,
                                   micro_batch_size=micro_batch_size)
    return depth, caches
