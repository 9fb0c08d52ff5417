"""DINOv2 ViT encoder, functional JAX.

Rebuild of the reference encoder (reference video_depth_anything/dinov2.py and
dinov2_layers/) as a pure function over a params pytree:

  * pre-norm ViT blocks with LayerScale (reference dinov2_layers/block.py:82-107)
  * fused-qkv attention via ops.attention (replaces xFormers MemEffAttention,
    reference dinov2_layers/attention.py:65-82)
  * conv patch embed, patch 14 (reference dinov2_layers/patch_embed.py:69-85)
  * bicubic pos-embed interpolation with the DINOv2 +0.1 offset workaround
    (reference dinov2.py:179-210)
  * ``encode`` == reference ``get_intermediate_layers(x, n, return_class_token=
    True)`` (reference dinov2.py:297-321): final LayerNorm applied to each tap,
    cls/patch split

Layout: NHWC input images, tokens (B, N, D).  All params fp32; compute dtype
follows the input.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Sequence

import jax
import jax.numpy as jnp

from vda_tpu.config import EncoderConfig
from vda_tpu.ops.attention import _on_tpu, packed_self_attention
from vda_tpu.ops.layers import (
    gelu,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from vda_tpu.ops.resize import resize_bicubic


def _use_pallas(n: int, dh: int) -> bool:
    return _on_tpu() and n >= 512 and dh % 8 == 0


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def init_block(key, cfg: EncoderConfig):
    d = cfg.embed_dim
    keys = jax.random.split(key, 8)
    if cfg.ffn_layer == "swiglufused":
        hidden = (int(int(d * cfg.mlp_ratio) * 2 / 3) + 7) // 8 * 8
        mlp = {
            "w12": init_linear(keys[2], d, 2 * hidden),
            "w3": init_linear(keys[3], hidden, d),
        }
    else:
        hidden = int(d * cfg.mlp_ratio)
        mlp = {
            "fc1": init_linear(keys[2], d, hidden),
            "fc2": init_linear(keys[3], hidden, d),
        }
    return {
        "norm1": init_layer_norm(d),
        "attn": {
            "qkv": {"w": _trunc_normal(keys[0], (d, 3 * d)),
                    "b": jnp.zeros((3 * d,))},
            "proj": {"w": _trunc_normal(keys[1], (d, d)),
                     "b": jnp.zeros((d,))},
        },
        "ls1": jnp.full((d,), cfg.init_values, jnp.float32),
        "norm2": init_layer_norm(d),
        "mlp": mlp,
        "ls2": jnp.full((d,), cfg.init_values, jnp.float32),
    }


def init_encoder(key, cfg: EncoderConfig):
    d = cfg.embed_dim
    p = cfg.patch_size
    keys = jax.random.split(key, cfg.depth + 4)
    return {
        "cls_token": 1e-6 * jax.random.normal(keys[0], (d,), jnp.float32),
        "pos_embed": _trunc_normal(keys[1], (1, cfg.num_patches + 1, d)),
        "mask_token": jnp.zeros((d,), jnp.float32),
        "patch_embed": {
            "w": _trunc_normal(keys[2], (p, p, 3, d)),
            "b": jnp.zeros((d,)),
        },
        "blocks": [init_block(keys[4 + i], cfg) for i in range(cfg.depth)],
        "norm": init_layer_norm(d),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _patch_embed(p, x):
    """(B, H, W, 3) -> (B, ph*pw, D) via k=s=14 conv == block-reshape matmul."""
    b, h, w, c = x.shape
    k = p["w"].shape[0]
    ph, pw = h // k, w // k
    # k == stride conv is a pure matmul over non-overlapping patches; express
    # it directly so XLA always lowers to one large MXU matmul.
    xx = x.reshape(b, ph, k, pw, k, c)
    xx = xx.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph * pw, k * k * c)
    wk = p["w"].astype(x.dtype).reshape(k * k * c, -1)
    return jnp.matmul(xx, wk) + p["b"].astype(x.dtype)


def _interp_pos_embed(pos_embed, grid_hw, cfg: EncoderConfig):
    """Reference dinov2.py:179-210 — bicubic with explicit scale_factor and
    the +interpolate_offset workaround, computed in fp32."""
    ph, pw = grid_hw
    n = pos_embed.shape[1] - 1
    side = int(math.sqrt(n))
    if ph * pw == n and ph == pw:
        return pos_embed
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:].reshape(1, side, side, -1)
    sh = (ph + cfg.interpolate_offset) / side
    sw = (pw + cfg.interpolate_offset) / side
    patch_pos = resize_bicubic(patch_pos.astype(jnp.float32), (ph, pw),
                               align_corners=False, scale=(sh, sw))
    patch_pos = patch_pos.reshape(1, ph * pw, -1)
    return jnp.concatenate([cls_pos, patch_pos.astype(pos_embed.dtype)], axis=1)


def _attention(p, x, num_heads: int, attn_impl: str,
               valid_len: int | None = None):
    b, n, d = x.shape
    dh = d // num_heads
    if p["qkv"]["w"].ndim == 3:
        # head-aligned TP layout (parallel/mesh.to_tp_layout): (d, 3, d)
        # weight whose LAST axis is model-sharded — q/k/v each come out
        # lane-sharded by whole heads, attention is shard-local, and the
        # only collective is the psum GSPMD inserts after the row-parallel
        # out-projection (Megatron recipe)
        qkv3 = jnp.einsum("bnd,dke->bnke", x,
                          p["qkv"]["w"].astype(x.dtype))
        qkv3 = qkv3 + p["qkv"]["b"].astype(qkv3.dtype)
        q, k, v = qkv3[..., 0, :], qkv3[..., 1, :], qkv3[..., 2, :]
        if valid_len is not None and valid_len < n:
            # encode() lane-pads tokens for the pallas granule; pad KEYS
            # must not enter the softmax (pad q rows stay garbage — they
            # are sliced off after the taps, like every row-independent op)
            from vda_tpu.ops.attention import _xla_attention
            qh = q.reshape(b, n, num_heads, dh)
            kh = k[:, :valid_len].reshape(b, valid_len, num_heads, dh)
            vh = v[:, :valid_len].reshape(b, valid_len, num_heads, dh)
            o = _xla_attention(qh, kh, vh, dh ** -0.5).reshape(b, n, d)
        else:
            o = packed_self_attention(q, k, v, num_heads,
                                      scale=dh ** -0.5, impl="xla")
        return linear(p["proj"], o)
    qkv = linear(p["qkv"], x)
    # fused qkv layout is [q | k | v] along the output dim
    # (reference dinov2_layers/attention.py:44,51)
    if attn_impl == "pallas" or (attn_impl == "auto" and _use_pallas(n, dh)):
        from vda_tpu.ops.pallas_attention import flash_attention_qkv

        # zero-copy path: the kernel reads q/k/v as lane-offset views of the
        # fused projection output
        o = flash_attention_qkv(qkv, num_heads, scale=dh ** -0.5,
                                valid_len=valid_len)
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = packed_self_attention(q, k, v, num_heads, scale=dh ** -0.5,
                                  impl="xla")
    return linear(p["proj"], o)


def _mlp(p, x, ffn_layer: str):
    if ffn_layer == "swiglufused":
        x12 = linear(p["w12"], x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return linear(p["w3"], jax.nn.silu(x1) * x2)
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def _seq_constrain(x):
    """Pin (B, N, D) activations to ('data', 'model', None) — token dim
    sharded over the model axis.  Requires an ambient mesh (jax.set_mesh);
    used only when EncoderConfig.seq_shard is set by the sharded trainer."""
    from jax.sharding import PartitionSpec as P

    from vda_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    return jax.lax.with_sharding_constraint(x, P(DATA_AXIS, MODEL_AXIS, None))


def _fuse_proj_usable(n: int, cfg: EncoderConfig, attn_impl: str) -> bool:
    """Gate for the fused attention+out-projection kernel: pallas attention
    must be engaged AND the single-group resident set must fit VMEM."""
    from vda_tpu.ops.pallas_attention import attn_proj_fits

    if not (attn_impl == "pallas"
            or (attn_impl == "auto" and _use_pallas(n, cfg.head_dim))):
        return False
    return attn_proj_fits(n, cfg.num_heads, cfg.head_dim)


def block_apply(p, x, cfg: EncoderConfig, attn_impl: str = "auto",
                valid_len: int | None = None,
                drop_path_rate: float = 0.0, rng=None):
    """Pre-norm block: x + ls1*attn(n1(x)); x + ls2*mlp(n2(x))
    (reference dinov2_layers/block.py:82-107, inference path).

    valid_len: set when x is lane-padded along N (padded-encoder fast path);
    only attention needs it — LN/MLP/residuals are row-independent so pad
    rows stay inert garbage.

    drop_path_rate > 0 with an rng applies stochastic depth to both residual
    branches (reference block.py:110-201 training path, drop_path.py:18-35).

    cfg.seq_shard pins the residual stream to a token-sharded layout in the
    norm regions (Megatron sequence parallelism): GSPMD emits
    all-gather(tokens) entering attention/MLP, and the row-parallel exits
    reduce into the token shards (reduce-scatter where the backend
    partitioner rewrites it; all-reduce + slice on XLA:CPU) —
    LayerNorm/residual/drop-path activations shrink by the tp factor.
    """
    from vda_tpu.ops.layers import drop_path

    sp = _seq_constrain if cfg.seq_shard else (lambda t: t)
    use_dp = drop_path_rate > 0.0 and rng is not None
    if use_dp:
        rng1, rng2 = jax.random.split(rng)
    x = sp(x)
    if (not use_dp and not cfg.seq_shard
            and os.environ.get("VDA_ATTN_FUSE_PROJ", "0") == "1"
            and p["attn"]["qkv"]["w"].ndim == 2
            and _fuse_proj_usable(x.shape[1], cfg, attn_impl)):
        # opt-in fused attention+projection+LayerScale+residual kernel
        # (VERDICT r4 #7): the attention output never round-trips HBM
        from vda_tpu.ops.pallas_attention import flash_attention_qkv_proj

        qkv = linear(p["attn"]["qkv"], layer_norm(p["norm1"], x))
        gb = jnp.stack([p["ls1"].astype(jnp.float32),
                        p["attn"]["proj"]["b"].astype(jnp.float32)])
        x = flash_attention_qkv_proj(
            qkv, p["attn"]["proj"]["w"].astype(qkv.dtype), gb, x,
            cfg.num_heads, scale=cfg.head_dim ** -0.5, valid_len=valid_len)
    else:
        h = _attention(p["attn"], layer_norm(p["norm1"], x), cfg.num_heads,
                       attn_impl, valid_len)
        h = h * p["ls1"].astype(h.dtype)
        if use_dp:
            h = drop_path(h, drop_path_rate, rng1)
        x = sp(x + h)
    h = _mlp(p["mlp"], layer_norm(p["norm2"], x), cfg.ffn_layer)
    h = h * p["ls2"].astype(h.dtype)
    if use_dp:
        h = drop_path(h, drop_path_rate, rng2)
    return x + h


def block_apply_nested(p, x_list, cfg: EncoderConfig, attn_impl: str = "auto"):
    """Variable-sequence batched block — reference NestedTensorBlock
    (dinov2_layers/block.py:204-252).

    x_list: list of (B_i, N_i, D) token batches with different N_i.  All
    samples are packed into one (1, sum(B_i*N_i), D) row sequence and run
    through ONE pre-norm block with block-diagonal (per-sample) attention via
    ``packed_self_attention(..., segment_lengths=...)`` — the TPU equivalent
    of the xFormers BlockDiagonalMask path.  Training-only in the reference
    (multi-crop batches); inference always uses uniform shapes.
    """
    d = x_list[0].shape[-1]
    seglens = []
    for xi in x_list:
        seglens.extend([xi.shape[1]] * xi.shape[0])
    packed = jnp.concatenate([xi.reshape(1, -1, d) for xi in x_list], axis=1)
    dh = d // cfg.num_heads
    scale = dh ** -0.5
    h = layer_norm(p["norm1"], packed)
    qkv = linear(p["attn"]["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = packed_self_attention(q, k, v, cfg.num_heads, scale, attn_impl,
                              segment_lengths=tuple(seglens))
    h = linear(p["attn"]["proj"], o)
    packed = packed + h * p["ls1"].astype(h.dtype)
    h = _mlp(p["mlp"], layer_norm(p["norm2"], packed), cfg.ffn_layer)
    packed = packed + h * p["ls2"].astype(h.dtype)
    outs = []
    off = 0
    for xi in x_list:
        n = xi.shape[0] * xi.shape[1]
        outs.append(packed[0, off:off + n].reshape(xi.shape))
        off += n
    return outs


def prepare_tokens(params, x, cfg: EncoderConfig, masks=None):
    """Patch-embed + optional iBOT masking + cls token + (interpolated)
    position embedding (reference dinov2.py:212-231).

    masks: optional (B, N_patches) bool — True entries have their patch
    embedding replaced by the learned ``mask_token`` BEFORE the position
    embedding is added (training-only, used by iBOT-style objectives;
    reference prepare_tokens_with_masks)."""
    b, h, w, _ = x.shape
    grid = (h // cfg.patch_size, w // cfg.patch_size)
    tokens = _patch_embed(params["patch_embed"], x)
    if masks is not None:
        mask_tok = params["mask_token"].astype(tokens.dtype)
        tokens = jnp.where(masks[..., None], mask_tok, tokens)
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype),
                           (b, 1, tokens.shape[-1]))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = _interp_pos_embed(params["pos_embed"], grid, cfg)
    return tokens + pos.astype(tokens.dtype)


def encode(params, x, cfg: EncoderConfig, tap_idx: Sequence[int],
           attn_impl: str = "auto", scan_blocks: bool | None = None,
           remat: bool = False, drop_path_rate: float = 0.0, rng=None,
           masks=None):
    """Reference get_intermediate_layers(x, tap_idx, return_class_token=True)
    (dinov2.py:297-321).

    x: (B, H, W, 3) normalized images.
    Returns list of (patch_tokens (B, N, D), cls_token (B, D)) per tap, with
    the final LayerNorm applied to each tap.

    scan_blocks=True runs the homogeneous block stack as lax.scan segments
    between tap points — one block compilation per segment instead of one per
    layer (vitl: 4 instead of 24), cutting compile time several-fold.
    MEASURED (r3, on-chip): the scan costs real runtime — the vitl window
    encoder runs 249.0 ms scanned vs 241.4 unrolled (~3%: per-iteration
    parameter slicing/carry copies) — so the default (None) resolves to
    UNROLLED on TPU (compiles are cached persistently) and scanned
    elsewhere (CPU tests at full scale would pay minutes of XLA compile).
    Override with VDA_SCAN_BLOCKS=0/1.  remat=True rematerializes each
    block on the backward pass (training memory <-> flops trade).

    On the TPU pallas path the token sequence is lane-padded (1370 -> 1408)
    ONCE here and every block runs tile-aligned with key masking inside the
    attention kernel — instead of each layer emitting a ~270 MB pad copy of
    its qkv tensor (~0.7 ms x 24 at the vitl window shape).

    drop_path_rate > 0 with an rng enables stochastic depth with the DINOv2
    linear per-layer schedule (reference dinov2.py:115-120,
    drop_path_uniform=False): rate_i = drop_path_rate * i / (depth - 1).
    The block stack then runs unrolled (per-block static rates), which is
    the training configuration anyway.
    """
    if scan_blocks is None:
        env = os.environ.get("VDA_SCAN_BLOCKS")
        if env is not None:
            scan_blocks = env == "1"
        else:
            from vda_tpu.ops.attention import _tpu_present

            scan_blocks = not _tpu_present()
    taps = set(tap_idx)
    h = prepare_tokens(params, x, cfg, masks=masks)
    n = h.shape[1]
    valid_len = None
    use_pallas_attn = attn_impl == "pallas" or (
        attn_impl == "auto" and _use_pallas(n, cfg.head_dim))
    granule = int(os.environ.get("VDA_PAD_GRANULE", "128"))
    if use_pallas_attn and n % granule:
        # 128 keeps the whole encoder at the attention kernel's natural lane
        # granule.  16 pads only to the sublane granule (1370 -> 1376 at the
        # vitl window), dropping 2.3% of every row-independent matmul's rows.
        # MEASURED DEAD END (r3, on-chip): granule 16 runs the vitl window at
        # 447.6 vs 354.9 ms — np_len=1376 has no 16-aligned block_q divisor
        # near the tuned 176 (only 688/32/16), so the attention kernel
        # degrades to 32-row q blocks (~+93 ms); ragged ceil-div grids hang
        # the Mosaic compile.  128 stays the default; the knob remains for
        # shapes whose 16-padded length tiles well.
        pad = (-n) % granule
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        valid_len = n
    out = {}
    apply_fn = block_apply
    if remat:
        # drop_path_rate (arg 5) must be STATIC too: block_apply branches on
        # `rate > 0.0` in Python, and jax.checkpoint traces keyword args
        apply_fn = jax.checkpoint(
            functools.partial(block_apply), static_argnums=(2, 3, 4, 5))
    if drop_path_rate > 0.0 and rng is not None:
        # stochastic depth: per-block static rates (DINOv2 linear decay
        # rule, reference dinov2.py:116-119) force the unrolled path
        depth = cfg.depth
        rates = [drop_path_rate * i / max(depth - 1, 1) for i in range(depth)]
        keys = jax.random.split(rng, depth)
        for i, bp in enumerate(params["blocks"]):
            h = apply_fn(bp, h, cfg, attn_impl, valid_len, rates[i],
                         rng=keys[i])
            if i in taps or i == cfg.depth - 1:
                out[i] = h
    elif scan_blocks:
        boundaries = sorted(taps | {cfg.depth - 1})
        start = 0
        for end in boundaries:
            seg = params["blocks"][start:end + 1]
            if len(seg) == 1:
                h = apply_fn(seg[0], h, cfg, attn_impl, valid_len, 0.0)
            else:
                stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *seg)

                def body(carry, bp):
                    return apply_fn(bp, carry, cfg, attn_impl, valid_len,
                                    0.0), None

                h, _ = jax.lax.scan(body, h, stacked)
            out[end] = h
            start = end + 1
    else:
        for i, bp in enumerate(params["blocks"]):
            h = apply_fn(bp, h, cfg, attn_impl, valid_len, 0.0)
            if i in taps:
                out[i] = h
    result = []
    for i in tap_idx:
        t = out[i][:, :n] if valid_len is not None else out[i]
        t = layer_norm(params["norm"], t)
        result.append((t[:, 1 + cfg.num_register_tokens:], t[:, 0]))
    return result
