"""Fused temporal-transformer-block kernel for the C=256 motion modules.

The reference's TemporalTransformerBlock (motion_module.py:137-189) is, per
spatial position, 2x (LayerNorm -> APE -> qkv -> tiny attention -> out proj
-> residual) followed by a GEGLU FF — at vitl's mm2/mm3 shape that is nine
HBM-materialized intermediates per block (qkv 269 MB, x12 718 MB, ...) and
~2.2 GB of traffic for ~0.64 TFLOP of math: measured 13.4 ms for mm3 where
the MXU-peak cost of the matmuls is ~3.3 ms.

This kernel runs the ENTIRE block in VMEM: all weights for a C=256 block
(~2.6 MB bf16) are grid-resident, each (G*T, C) row tile is read from HBM
once and written once.  The attention inside is the tiny-seq block-diagonal
scheme of ops/pallas_attention.py (G sequences of length T per tile, one
full-width MXU pass per head with an off-block -inf mask).

Numerics mirror the unfused path exactly: LayerNorm stats in fp32 (eps 1e-5,
torch default), PE added post-norm in bf16, matmuls with fp32 accumulation
rounded to bf16, softmax max-subtracted with bf16 exp / fp32 sum and the
normalization deferred to the (rows, dh) output, tanh GELU in bf16.

Only the offline (cache-free, APE) path dispatches here; streaming and RoPE
fall back to models/temporal.py's unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vda_tpu.ops.pallas_attention import _interpret

# Weights are grid-resident: total VMEM per cell is (weights ~2.6 MB) +
# (tile data ~2.5 MB) + (fp32 score tile 1 MB/head live) + double-buffered
# row tiles; 512 rows keeps the sum ~7 MB, inside the 16 MB stack.
_MAX_FUSED_WIDTH = 512  # widest C whose block weights fit VMEM comfortably


def _ln(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype)


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _attention(h, pe, n_scale, n_bias, wqkv, wout, bout, *, heads, seq, same,
               sub_rows: int = 128):
    """One LN -> +PE -> qkv -> block-diag attention -> out-proj residual.

    The qkv/out projections run on the full row tile (wide MXU passes); the
    score/value matmuls are sub-blocked to ``sub_rows`` rows — sequences
    never cross a 128-row boundary (128 % seq == 0 is required by the
    caller), so a (tile, tile) score matrix wastes 4x more MXU passes than
    four (128, 128) ones for the same block-diagonal result.
    """
    rows, c = h.shape
    d = c // heads
    hn = _ln(h, n_scale, n_bias) + pe
    qkv = _mm(hn, wqkv).astype(h.dtype)            # (rows, 3C)
    scale = d ** -0.5
    n_sub = max(rows // sub_rows, 1)
    sub = rows // n_sub

    def qk(r0, hh):
        return jax.lax.dot_general(
            qkv[r0:r0 + sub, hh * d:(hh + 1) * d],
            qkv[r0:r0 + sub, c + hh * d:c + (hh + 1) * d],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    row_chunks = []
    for si in range(n_sub):
        r0 = si * sub
        outs = []
        # software-pipelined like _attn_kernel_packed: head hh+1's MXU
        # logits are issued before head hh's VPU softmax
        s_next = qk(r0, 0)
        for hh in range(heads):
            s = s_next
            if hh + 1 < heads:
                s_next = qk(r0, hh + 1)
            vh = qkv[r0:r0 + sub, 2 * c + hh * d:2 * c + (hh + 1) * d]
            s = jnp.where(same, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = (jnp.exp((s - m).astype(jnp.bfloat16))
                 if h.dtype == jnp.bfloat16 else jnp.exp(s - m))
            z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            outs.append((_mm(e.astype(vh.dtype), vh) / z).astype(h.dtype))
        row_chunks.append(jnp.concatenate(outs, axis=-1))
    o = (row_chunks[0] if n_sub == 1
         else jnp.concatenate(row_chunks, axis=0))
    out = _mm(o, wout) + bout.astype(jnp.float32)
    return h + out.astype(h.dtype)


def _block_kernel(h_ref, pe_ref,
                  n0s_ref, n0b_ref, wqkv0_ref, wout0_ref, bout0_ref,
                  n1s_ref, n1b_ref, wqkv1_ref, wout1_ref, bout1_ref,
                  nfs_ref, nfb_ref, wproj_ref, bproj_ref, wffo_ref, bffo_ref,
                  o_ref, *, heads: int, seq: int):
    rows = h_ref.shape[0]
    # Measured (v5e, mm3 shape): sub-blocking the score matmuls to 128 rows
    # (4x fewer wasted MXU passes) is SLOWER — 10.4 vs 8.6 ms — the 32 small
    # per-head matmuls serialize on issue overhead.  One full-tile pass per
    # head wins; keep sub == rows.
    sub = rows
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0) // seq
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1) // seq
    same = row_blk == col_blk

    h = h_ref[...]
    pe = pe_ref[...].astype(h.dtype)
    h = _attention(h, pe, n0s_ref[...], n0b_ref[...], wqkv0_ref[...],
                   wout0_ref[...], bout0_ref[...], heads=heads, seq=seq,
                   same=same, sub_rows=sub)
    h = _attention(h, pe, n1s_ref[...], n1b_ref[...], wqkv1_ref[...],
                   wout1_ref[...], bout1_ref[...], heads=heads, seq=seq,
                   same=same, sub_rows=sub)
    # GEGLU FF (reference motion_module/attention.py:363-384)
    hn = _ln(h, nfs_ref[...], nfb_ref[...])
    x12 = (_mm(hn, wproj_ref[...])
           + bproj_ref[...].astype(jnp.float32)).astype(h.dtype)
    cff = x12.shape[-1] // 2
    x1 = x12[:, :cff]
    gate = x12[:, cff:]
    g = x1 * jax.nn.gelu(gate, approximate=h.dtype == jnp.bfloat16)
    ff = _mm(g, wffo_ref[...]) + bffo_ref[...].astype(jnp.float32)
    o_ref[...] = h + ff.astype(h.dtype)


def _attn_only_kernel(h_ref, pe_ref, ns_ref, nb_ref, wqkv_ref, wout_ref,
                      bout_ref, o_ref, *, heads: int, seq: int):
    rows = h_ref.shape[0]
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // seq
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // seq
    same = row_blk == col_blk
    h = h_ref[...]
    o_ref[...] = _attention(h, pe_ref[...].astype(h.dtype), ns_ref[...],
                            nb_ref[...], wqkv_ref[...], wout_ref[...],
                            bout_ref[...], heads=heads, seq=seq, same=same,
                            sub_rows=rows)


def attn_fused_supported(c: int, t: int, pe: str, heads: int) -> bool:
    """Attention-only fusion for the WIDE modules (vitl mm0/mm1 C=1024):
    the attention weights (c, 3c)+(c, c) ~8.3 MB bf16 fit VMEM-resident,
    the GEGLU FF does not (16+8 MB) and stays on XLA."""
    return (pe == "ape" and _MAX_FUSED_WIDTH < c <= 1024 and t <= 64
            and c % 128 == 0 and c % heads == 0 and (c // heads) % 8 == 0)


def attention_block_fused(ap, np_, h, pe_table, *, heads: int, seq: int,
                          rows_per_tile: int = 256):
    """One LN -> +PE -> qkv -> block-diag attention -> out-proj -> residual,
    fused, for modules whose FF is too wide to co-reside (C=1024).

    ap: attention params {to_q,to_k,to_v,to_out}; np_: the block's LN params
    for this attention ({"scale","bias"}).  h: (BD, T, C).  The row tile is
    256 (not 512): the resident weights leave ~half the VMEM of the C=256
    full-block kernel.
    """
    bd, t, c = h.shape
    assert t == seq
    import os as _os
    if _os.environ.get("VDA_ATTN_FUSED_RPT"):
        rows_per_tile = int(_os.environ["VDA_ATTN_FUSED_RPT"])  # sweep knob
    g = max(rows_per_tile // seq, 1)
    tile = g * seq
    pad_bd = (-bd) % g
    if pad_bd:
        h = jnp.pad(h, ((0, pad_bd), (0, 0), (0, 0)))
    total = (bd + pad_bd) * seq
    hf = h.reshape(total, c)
    pe_tile = jnp.tile(pe_table.astype(jnp.float32), (g, 1))
    wqkv = jnp.concatenate(
        [ap["to_q"]["w"], ap["to_k"]["w"], ap["to_v"]["w"]], axis=1
    ).astype(h.dtype)

    operands = [
        hf, pe_tile, np_["scale"].reshape(1, -1), np_["bias"].reshape(1, -1),
        wqkv, ap["to_out"]["w"].astype(h.dtype),
        ap["to_out"]["b"].reshape(1, -1),
    ]

    def tile_spec():
        return pl.BlockSpec((tile, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_attn_only_kernel, heads=heads, seq=seq)
    out = pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[tile_spec(), full_spec(pe_tile)]
        + [full_spec(a) for a in operands[2:]],
        out_specs=tile_spec(),
        out_shape=jax.ShapeDtypeStruct((total, c), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * total * c * 4 * c + 4 * total * tile * c,
            bytes_accessed=2 * total * c * h.dtype.itemsize,
            transcendentals=total * tile * heads,
        ),
        interpret=_interpret(),
    )(*operands)
    out = out.reshape(bd + pad_bd, seq, c)
    return out[:bd] if pad_bd else out


def fused_block_supported(c: int, t: int, pe: str, heads: int,
                          n_attn: int = 2) -> bool:
    """The kernel body hardcodes the reference block structure: exactly two
    attention sub-blocks then the GEGLU FF (motion_module.py:137-189)."""
    return (pe == "ape" and n_attn == 2 and c <= _MAX_FUSED_WIDTH
            and t <= 64 and c % 128 == 0 and c % heads == 0
            and (c // heads) % 8 == 0)


_RPT_OVERRIDE = None  # rows-per-tile sweep hook (scripts/bench_tail.py mm3f)


def temporal_block_fused(bp, h, pe_table, *, heads: int, seq: int,
                         rows_per_tile: int = 512):
    """Run one TemporalTransformerBlock on (BD, T, C) sequences, fused.

    bp: the block params pytree from models/temporal.init_temporal_module
    (keys: attn[2] {to_q,to_k,to_v,to_out}, norms[2], ff{proj,out}, ff_norm).
    pe_table: (T, C) fp32 sinusoidal table.  Returns (BD, T, C).

    The q/k/v weights are concatenated host-side into one (C, 3C) operand —
    the same fusion the unfused offline path uses (models/temporal.py
    ``_temporal_attention``), hoisted by XLA outside the grid.
    """
    bd, t, c = h.shape
    assert t == seq
    if _RPT_OVERRIDE:
        rows_per_tile = _RPT_OVERRIDE
    g = max(rows_per_tile // seq, 1)
    tile = g * seq
    pad_bd = (-bd) % g
    if pad_bd:
        h = jnp.pad(h, ((0, pad_bd), (0, 0), (0, 0)))
    total = (bd + pad_bd) * seq
    hf = h.reshape(total, c)

    pe_tile = jnp.tile(pe_table.astype(jnp.float32), (g, 1))  # (tile, C)

    def row(v):
        return v.reshape(1, -1)

    def wqkv(a):
        return jnp.concatenate(
            [a["to_q"]["w"], a["to_k"]["w"], a["to_v"]["w"]], axis=1
        ).astype(h.dtype)

    a0, a1 = bp["attn"][0], bp["attn"][1]
    n0, n1 = bp["norms"][0], bp["norms"][1]
    operands = [
        hf, pe_tile,
        row(n0["scale"]), row(n0["bias"]), wqkv(a0),
        a0["to_out"]["w"].astype(h.dtype), row(a0["to_out"]["b"]),
        row(n1["scale"]), row(n1["bias"]), wqkv(a1),
        a1["to_out"]["w"].astype(h.dtype), row(a1["to_out"]["b"]),
        row(bp["ff_norm"]["scale"]), row(bp["ff_norm"]["bias"]),
        bp["ff"]["proj"]["w"].astype(h.dtype), row(bp["ff"]["proj"]["b"]),
        bp["ff"]["out"]["w"].astype(h.dtype), row(bp["ff"]["out"]["b"]),
    ]

    def tile_spec():
        return pl.BlockSpec((tile, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(a):
        shape = a.shape
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    in_specs = [tile_spec(), full_spec(pe_tile)] + \
               [full_spec(a) for a in operands[2:]]

    kernel = functools.partial(_block_kernel, heads=heads, seq=seq)
    c_ff = bp["ff"]["proj"]["w"].shape[1] // 2
    out = pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=in_specs,
        out_specs=tile_spec(),
        out_shape=jax.ShapeDtypeStruct((total, c), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * total * c * (2 * (3 * c + c) + 2 * c_ff + 2 * c_ff)
            + 4 * total * tile * c,
            bytes_accessed=2 * total * c * h.dtype.itemsize,
            transcendentals=total * tile * heads,
        ),
        interpret=_interpret(),
    )(*operands)
    out = out.reshape(bd + pad_bd, seq, c)
    return out[:bd] if pad_bd else out
