"""Temporal motion module (AnimateDiff-style temporal transformer), JAX.

Rebuild of reference video_depth_anything/motion_module/motion_module.py and
motion_module/attention.py as pure functions:

  * TemporalModule -> TemporalTransformer3DModel: GroupNorm(32) + proj_in,
    N transformer blocks, zero-initialized proj_out, residual add, operating
    per-pixel across time (reference motion_module.py:102-134)
  * TemporalTransformerBlock: 2x (LayerNorm -> TemporalAttention -> residual)
    then GEGLU FF + norm (reference motion_module.py:137-189)
  * TemporalAttention: sinusoidal APE (reference motion_module.py:192-210) or
    RoPE (reference motion_module/attention.py:403-429); KV-cache path where
    the query covers only the new frame(s) and K/V span cache+new
    (reference motion_module.py:249-274).  The values cached are the
    *pre-position-encoding* hidden states (motion_module.py:251-254).

Layout: features are (B, T, H, W, C) channels-last.  Temporal attention runs
over (B*H*W, T, C) sequences — a huge-batch, tiny-seq shape where score
matrices are small, so plain XLA batched matmuls are already near the HBM
roofline; the heavy cost here is the q/k/v/out projections, which XLA maps
straight onto the MXU.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vda_tpu.config import ModelConfig
from vda_tpu.ops.layers import (
    gelu,
    group_norm,
    init_layer_norm,
    init_linear,
    init_zeros_linear,
    layer_norm,
    linear,
)


# ---------------------------------------------------------------------------
# positional encodings
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    """Sinusoidal APE table (reference motion_module.py:192-210), fp32."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                      * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _rope_tables(dim: int, end: int, theta: float = 10000.0):
    """cos/sin tables equivalent to reference precompute_freqs_cis
    (motion_module/attention.py:403-408)."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    t = np.arange(end, dtype=np.float64)
    f = np.outer(t, freqs)
    return np.cos(f).astype(np.float32), np.sin(f).astype(np.float32)


def _apply_rope(x, cos, sin):
    """Rotary embedding over channel pairs (reference attention.py:419-429)."""
    x32 = x.astype(jnp.float32)
    xr = x32[..., 0::2]
    xi = x32[..., 1::2]
    orr = xr * cos - xi * sin
    oi = xr * sin + xi * cos
    out = jnp.stack([orr, oi], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_temporal_module(key, in_channels: int, cfg: ModelConfig):
    c = in_channels
    keys = jax.random.split(key, 2 + cfg.num_transformer_block)

    def init_tblock(k):
        ks = jax.random.split(k, 2 * cfg.num_attention_blocks + 2)
        attn = []
        for i in range(cfg.num_attention_blocks):
            k4 = jax.random.split(ks[i], 4)
            attn.append({
                "to_q": init_linear(k4[0], c, c, bias=False),
                "to_k": init_linear(k4[1], c, c, bias=False),
                "to_v": init_linear(k4[2], c, c, bias=False),
                "to_out": init_linear(k4[3], c, c),
            })
        return {
            "attn": attn,
            "norms": [init_layer_norm(c) for _ in range(cfg.num_attention_blocks)],
            "ff": {
                "proj": init_linear(ks[-2], c, 8 * c),
                "out": init_linear(ks[-1], 4 * c, c),
            },
            "ff_norm": init_layer_norm(c),
        }

    return {
        "norm": init_layer_norm(c),  # GroupNorm scale/bias
        "proj_in": init_linear(keys[0], c, c),
        "blocks": [init_tblock(keys[2 + i])
                   for i in range(cfg.num_transformer_block)],
        # zero_initialize=True (reference motion_module.py:57-58)
        "proj_out": init_zeros_linear(c, c),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _temporal_attention(p, h, cfg: ModelConfig,
                        cache, want_kv: bool = False,
                        attn_impl: str = "auto"):
    """h: (BD, T_new, C) sequences (already rearranged per spatial position).

    cache: None, a (BD, T_cache, C) array of pre-PE hidden states (the
    reference's cache content, motion_module.py:251-254), or a
    ``(k_ctx, v_ctx)`` tuple of (BD, T_cache, C) pre-PE *projections* (the
    TPU streaming fast path, see ``_temporal_attention_kv``).
    Returns (out (BD, T_new, C), cache_row) where cache_row matches the
    cache kind: pre-PE hidden states, or (k_new, v_new) when ``want_kv`` or
    a kv cache was passed.  Reference motion_module.py:242-321.
    """
    if isinstance(cache, tuple):
        if len(cache) == 4:
            return _temporal_attention_kv_direct(p, h, cfg, cache)
        if len(cache) == 3:
            return _temporal_attention_kv_ctx(p, h, cfg, cache)
        return _temporal_attention_kv(p, h, cfg, cache)
    input_hidden_states = h
    d_in = 0
    if cache is not None:
        # drop streaming-buffer row padding (see _temporal_attention_kv)
        d_in = cache.shape[1]
        h = jnp.concatenate([cache[:h.shape[0]].astype(h.dtype), h], axis=1)

    bd, t_full, c = h.shape
    if cfg.pe == "ape":
        pe = jnp.asarray(_sinusoidal_pe(t_full, c))
        h = h + pe[None, :t_full].astype(h.dtype)

    if d_in == 0 and not cfg.tp_layout:
        # rope is applied after projection, so fusing stays valid.
        # offline path: q/k/v all project the same h — one fused (C, 3C)
        # matmul keeps the MXU busy at small widths (C=256 modules measured
        # ~36 TF/s with three separate matmuls; the weight concat is a few
        # hundred KB and hoisted off the critical path by XLA).  Under
        # tp_layout the concat would be head-MISALIGNED across shards, so
        # TP keeps three separate column-parallel matmuls (below).
        w = jnp.concatenate(
            [p["to_q"]["w"], p["to_k"]["w"], p["to_v"]["w"]], axis=1)
        qkv = jnp.matmul(h, w.astype(h.dtype))
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q_in = h[:, d_in:]
        q = linear(p["to_q"], q_in)
        k = linear(p["to_k"], h)
        v = linear(p["to_v"], h)

    if cfg.pe == "rope":
        cos, sin = _rope_tables(c, t_full)
        cos_q = jnp.asarray(cos)[None, d_in:t_full]
        sin_q = jnp.asarray(sin)[None, d_in:t_full]
        cos_k = jnp.asarray(cos)[None, :t_full]
        sin_k = jnp.asarray(sin)[None, :t_full]
        q = _apply_rope(q, cos_q, sin_q)
        k = _apply_rope(k, cos_k, sin_k)

    heads = cfg.num_attention_heads
    dh = c // heads
    t_q = q.shape[1]
    use_kernel = (t_q == t_full and t_full <= 64 and dh % 8 == 0
                  and attn_impl != "xla"  # pallas kernels have no VJP rule
                  and not cfg.tp_layout and _on_tpu_or_interpret())
    if use_kernel:
        from vda_tpu.ops.pallas_attention import tiny_seq_attention

        o = tiny_seq_attention(q, k, v, heads=heads, seq=t_full,
                               scale=dh ** -0.5)
    else:
        from vda_tpu.ops.attention import _xla_attention

        o = _xla_attention(q.reshape(bd, -1, heads, dh),
                           k.reshape(bd, t_full, heads, dh),
                           v.reshape(bd, t_full, heads, dh),
                           dh ** -0.5).reshape(bd, -1, c)
    out = linear(p["to_out"], o)
    if want_kv:
        # pre-PE projections of the new frames, for the streaming KV cache
        return out, (linear(p["to_k"], input_hidden_states),
                     linear(p["to_v"], input_hidden_states))
    return out, input_hidden_states


def _temporal_attention_kv(p, h, cfg: ModelConfig, cache):
    """Streaming fast path: the cache holds pre-PE K/V *projections*.

    The reference re-projects all 32 context frames through to_k/to_v every
    step (motion_module.py:266-274 with the assembled cache) — ~0.6 TFLOP
    per streaming step at vitl.  to_k/to_v are bias-free linear maps, so
    to_k(h_i + pe[pos_i]) == to_k(h_i) + to_k(pe[pos_i]): cache to_k(h_i)
    once per frame and add the projected position encoding — a (T, C)
    matmul — per step.  With RoPE the split is exact (rotation is applied
    post-projection); with APE it differs from the reference only by one
    rounding of the sum, below bf16 noise (quantified in
    tests/test_streaming_kv.py).
    """
    kc, vc = cache
    bd, t_new, c = h.shape
    # streaming buffers are row-padded to the direct kernel's tile size
    # (infer/streaming._pad_rows); the assembled context keeps the pad rows —
    # drop them here where the true spatial size is known
    kc = kc[:bd]
    vc = vc[:bd]
    d_in = kc.shape[1]
    t_full = d_in + t_new
    k_new = linear(p["to_k"], h)
    v_new = linear(p["to_v"], h)
    k = jnp.concatenate([kc.astype(h.dtype), k_new], axis=1)
    v = jnp.concatenate([vc.astype(h.dtype), v_new], axis=1)

    if cfg.pe == "ape":
        pe = jnp.asarray(_sinusoidal_pe(t_full, c)).astype(h.dtype)
        q = linear(p["to_q"], h + pe[None, d_in:t_full])
        k = k + linear(p["to_k"], pe)[None]
        v = v + linear(p["to_v"], pe)[None]
    else:
        q = linear(p["to_q"], h)
        cos, sin = _rope_tables(c, t_full)
        q = _apply_rope(q, jnp.asarray(cos)[None, d_in:t_full],
                        jnp.asarray(sin)[None, d_in:t_full])
        k = _apply_rope(k, jnp.asarray(cos)[None, :t_full],
                        jnp.asarray(sin)[None, :t_full])

    heads = cfg.num_attention_heads
    dh = c // heads
    from vda_tpu.ops.attention import _xla_attention

    o = _xla_attention(q.reshape(bd, t_new, heads, dh),
                       k.reshape(bd, t_full, heads, dh),
                       v.reshape(bd, t_full, heads, dh),
                       dh ** -0.5).reshape(bd, t_new, c)
    return linear(p["to_out"], o), (k_new, v_new)


def _temporal_attention_kv_ctx(p, h, cfg: ModelConfig, cache):
    """Fused cached-head attention over the ASSEMBLED context.

    cache: (k_ctx, v_ctx, "ctx") — pre-PE K/V projection context rows
    (BHW_pad, 31, C) produced by the streaming one-hot assembly (the
    measured-optimal read path), plus a marker distinguishing this from the
    plain kv tuple.  Where ``_temporal_attention_kv`` materializes
    concat + PE-add passes over the (BHW, 32, C) context before the
    attention einsums re-read it, this path hands the assembled rows to ONE
    Pallas kernel (ops/pallas_stream.stream_kv_attention with every row
    valid) that streams them through VMEM once: PE add, scores, softmax and
    the value contraction all in-kernel.  Unlike the measured-dead-end
    direct path (VDA_STREAM_DIRECT — in-kernel reads of all 43 ring rows),
    the 31-row context here is already dense, so the kernel reads no dead
    bytes.  Numerics: same bf16 PE adds / fp32 score accumulation recipe as
    the kv path.  Reference semantics: motion_module.py:249-274.

    Falls back to ``_temporal_attention_kv`` off-TPU or at shapes the
    kernel doesn't support (t_new > 1, RoPE, TP layout, unpadded rows).
    """
    kc, vc = cache[0], cache[1]
    bd, t_new, c = h.shape
    bhw_pad, t_ctx = kc.shape[0], kc.shape[1]
    heads = cfg.num_attention_heads
    dh = c // heads
    gw = min(c, 512)
    from vda_tpu.ops.pallas_stream import ROW_TILE
    ok = (t_new == 1 and cfg.pe == "ape" and not cfg.tp_layout
          and bhw_pad % ROW_TILE == 0 and c % gw == 0 and gw % dh == 0
          and dh % 8 == 0 and _on_tpu_or_interpret())
    if not ok:
        return _temporal_attention_kv(p, h, cfg, (kc, vc))
    from vda_tpu.ops.pallas_stream import stream_kv_attention

    t_full = t_ctx + 1
    pe = jnp.asarray(_sinusoidal_pe(t_full, c)).astype(h.dtype)
    k_new = linear(p["to_k"], h)          # pre-PE, what gets cached
    v_new = linear(p["to_v"], h)
    pe_k_proj = linear(p["to_k"], pe)     # (32, C)
    pe_v_proj = linear(p["to_v"], pe)
    q = linear(p["to_q"], h + pe[None, t_full - 1:t_full])[:, 0]
    kn = k_new[:, 0] + pe_k_proj[t_full - 1]
    vn = v_new[:, 0] + pe_v_proj[t_full - 1]
    pad = bhw_pad - bd
    if pad:
        padding = ((0, pad), (0, 0))
        q = jnp.pad(q, padding)
        kn = jnp.pad(kn, padding)
        vn = jnp.pad(vn, padding)
    valid = jnp.ones((t_ctx,), jnp.bool_)
    o = stream_kv_attention(q, kn, vn, kc.astype(h.dtype),
                            vc.astype(h.dtype), pe_k_proj[:t_ctx],
                            pe_v_proj[:t_ctx], valid, heads=heads,
                            scale=dh ** -0.5)
    out = linear(p["to_out"], o[:bd][:, None])
    return out, (k_new, v_new)


def _temporal_attention_kv_direct(p, h, cfg: ModelConfig, cache):
    """Steady-state streaming fast path: attend straight over the ring
    buffers, no context materialization.

    cache: (k_buf, v_buf, pos_map, valid) —
      k_buf/v_buf: (BHW_pad, ROWS, C) pre-PE K/V projections (the streaming
        cache buffers, row-padded to the kernel tile; infer/streaming),
      pos_map: (ROWS,) int32 logical context position (0..T-2) of each
        buffer row, arbitrary where invalid,
      valid: (ROWS,) bool — rows that form the 31-entry context.

    Equivalent to assembling the context with pos_map's permutation and
    running ``_temporal_attention_kv`` (APE only; same bf16 PE adds, fp32
    score/stat accumulation) — but the buffers are read ONCE by a fused
    kernel (ops/pallas_stream) instead of assembly-write-reread (~3 HBM
    passes over ~1 GB per step).  Only t_new == 1 (one new frame).
    """
    from vda_tpu.ops.pallas_stream import stream_kv_attention

    k_buf, v_buf, pos_map, valid = cache
    bd, t_new, c = h.shape
    assert t_new == 1 and cfg.pe == "ape"
    from vda_tpu.config import INFER_LEN

    bhw_pad = k_buf.shape[0]
    t_full = INFER_LEN  # 31 context positions + the new frame
    pe = jnp.asarray(_sinusoidal_pe(t_full, c)).astype(h.dtype)
    k_new = linear(p["to_k"], h)          # pre-PE, cached
    v_new = linear(p["to_v"], h)
    pe_k_proj = linear(p["to_k"], pe)     # (32, C)
    pe_v_proj = linear(p["to_v"], pe)
    q = linear(p["to_q"], h + pe[None, t_full - 1:t_full])[:, 0]
    kn = k_new[:, 0] + pe_k_proj[t_full - 1]
    vn = v_new[:, 0] + pe_v_proj[t_full - 1]
    idx = jnp.clip(pos_map, 0, t_full - 2)
    pe_k_rows = jnp.take(pe_k_proj, idx, axis=0)   # (ROWS, C); invalid rows
    pe_v_rows = jnp.take(pe_v_proj, idx, axis=0)   # masked by the kernel bias

    pad = bhw_pad - bd
    if pad:
        padding = ((0, pad), (0, 0))
        q = jnp.pad(q, padding)
        kn = jnp.pad(kn, padding)
        vn = jnp.pad(vn, padding)
    heads = cfg.num_attention_heads
    dh = c // heads
    o = stream_kv_attention(q, kn, vn, k_buf, v_buf, pe_k_rows, pe_v_rows,
                            valid, heads=heads, scale=dh ** -0.5)
    out = linear(p["to_out"], o[:bd][:, None])
    return out, (k_new, v_new)


def _on_tpu_or_interpret() -> bool:
    import os

    from vda_tpu.ops.attention import _on_tpu

    return _on_tpu() or os.environ.get("VDA_PALLAS_INTERPRET", "0") == "1"


def _transformer_block(p, h, cfg: ModelConfig, caches, want_kv: bool = False,
                       need_caches: bool = True, attn_impl: str = "auto"):
    """h: (BD, T_new, C).  Reference motion_module.py:172-189."""
    c = h.shape[-1]
    from vda_tpu.ops.pallas_temporal import attn_fused_supported
    # attn_impl="xla" must disable the Pallas kernels entirely: training
    # (parallel/train.make_train_step) differentiates this path and
    # pallas_call has no autodiff rule
    use_attn_fused = (caches is None and not want_kv and not need_caches
                      and attn_impl != "xla"
                      and not cfg.tp_layout
                      and attn_fused_supported(c, h.shape[1], cfg.pe,
                                               cfg.num_attention_heads)
                      and _on_tpu_or_interpret())
    out_caches = []
    for i in range(cfg.num_attention_blocks):
        if use_attn_fused:
            # wide-C offline path (vitl mm0/mm1): whole attention sub-block
            # in one kernel, weights VMEM-resident (ops/pallas_temporal)
            from vda_tpu.ops.pallas_temporal import attention_block_fused
            pe_table = jnp.asarray(_sinusoidal_pe(h.shape[1], c))
            h = attention_block_fused(p["attn"][i], p["norms"][i], h,
                                      pe_table,
                                      heads=cfg.num_attention_heads,
                                      seq=h.shape[1])
            continue
        hn = layer_norm(p["norms"][i], h, eps=1e-5)
        attn_out, input_hs = _temporal_attention(
            p["attn"][i], hn, cfg, caches[i] if caches is not None else None,
            want_kv=want_kv, attn_impl=attn_impl)
        h = attn_out + h
        out_caches.append(input_hs)
    # GEGLU FF (reference motion_module/attention.py:363-384).  MEASURED
    # DEAD END (r3): a Pallas fused proj+GEGLU kernel that never
    # materializes x12 (ops/pallas_temporal.geglu_in) ran mm0 at 17.8 vs
    # 14.8 ms — the col-blocked grid re-reads hn 4x and loses XLA's
    # matmul/epilogue overlap; x12's HBM round trip is cheaper.
    hn = layer_norm(p["ff_norm"], h, eps=1e-5)
    x12 = linear(p["ff"]["proj"], hn)
    x1, gate = jnp.split(x12, 2, axis=-1)
    h = linear(p["ff"]["out"], x1 * gelu(gate)) + h
    return h, out_caches


def temporal_module_apply(
    p, x, cfg: ModelConfig,
    cache_list: Optional[List] = None,
    want_kv: bool = False,
    need_caches: bool = True,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, List]:
    """Apply one TemporalModule.

    x: (B, T, H, W, C).  When ``cache_list`` is given (streaming), T is the
    number of NEW frames and each cache entry is (B*H*W, T_cache, C) pre-PE
    hidden states (reference motion_module.py:104-134) or a (k, v) tuple of
    pre-PE projections (``want_kv`` streaming fast path).  Returns
    (output (B, T, H, W, C), new_cache_list) with
    ``num_transformer_block * num_attention_blocks`` entries of the
    matching kind for the new frames.

    need_caches=False (offline windows, where forward() discards the cache)
    unlocks the fused whole-block Pallas kernel for narrow-C modules
    (ops/pallas_temporal.py) and returns an EMPTY cache list.
    """
    b, t, hh, ww, c = x.shape
    residual = x
    n_inst = b * t
    h = group_norm(p["norm"], x.reshape(n_inst, hh, ww, c),
                   cfg.norm_num_groups, eps=1e-6)
    h = h.reshape(b, t, hh * ww, c)
    h = linear(p["proj_in"], h)

    # (B, T, D, C) -> (B*D, T, C) sequences per spatial position
    h = h.transpose(0, 2, 1, 3).reshape(b * hh * ww, t, c)

    from vda_tpu.ops.pallas_temporal import fused_block_supported
    use_fused = (cache_list is None and not want_kv and not need_caches
                 and attn_impl != "xla"  # training path must stay autodiff-able
                 and not cfg.tp_layout
                 and fused_block_supported(c, t, cfg.pe,
                                           cfg.num_attention_heads,
                                           cfg.num_attention_blocks)
                 and _on_tpu_or_interpret())

    n_blocks = len(p["blocks"])
    n_per = cfg.num_attention_blocks
    all_caches = []
    if use_fused:
        from vda_tpu.ops.pallas_temporal import temporal_block_fused
        pe_table = jnp.asarray(_sinusoidal_pe(t, c))
        for bp in p["blocks"]:
            h = temporal_block_fused(bp, h, pe_table,
                                     heads=cfg.num_attention_heads, seq=t)
    else:
        for i, bp in enumerate(p["blocks"]):
            caches = None
            if cache_list is not None:
                caches = cache_list[i * n_per:(i + 1) * n_per]
            h, out_caches = _transformer_block(bp, h, cfg, caches,
                                               want_kv=want_kv,
                                               need_caches=need_caches,
                                               attn_impl=attn_impl)
            all_caches.extend(out_caches)

    h = h.reshape(b, hh * ww, t, c).transpose(0, 2, 1, 3)
    h = linear(p["proj_out"], h)
    h = h.reshape(b, t, hh, ww, c)
    return h + residual, all_caches
