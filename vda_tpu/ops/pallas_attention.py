"""Pallas fused attention for the spatial ViT shape.

Replaces the reference's xFormers ``memory_efficient_attention``
(reference dinov2_layers/attention.py:65-82).  For the encoder shape
(batch 32, seq 1370, heads 16, dh 64) the dominant cost of a naive XLA
attention is HBM traffic on the (N, N) score matrices (~180 GB per vitl
window).  This kernel keeps scores in VMEM: for each (batch*head, q-block)
grid cell it loads the full K/V for that head (seq*dh*2B ~ 350 KB — far under
the ~16 MB VMEM budget), computes the fp32 logits block, softmaxes in-register
and immediately contracts with V.  No online-softmax rescaling pass is needed
because the whole KV sequence fits in VMEM at these lengths.

The sequence is zero-padded to a multiple of the q-block; padded key columns
are masked to -inf before the softmax so results are exact.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Run kernels in interpreter mode (CPU tests set VDA_PALLAS_INTERPRET=1)."""
    return os.environ.get("VDA_PALLAS_INTERPRET", "0") == "1"


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int):
    q = q_ref[0]            # (BQ, D)
    k = k_ref[0]            # (NP, D)
    v = v_ref[0]            # (NP, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale               # (BQ, NP) fp32
    np_len = k.shape[0]
    if valid_len < np_len:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < valid_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    z = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / z).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def _flash_bhnd(qt, kt, vt, scale: float, block_q: int):
    """qt/kt/vt: (BH, NP, D) padded; returns (BH, NP, D)."""
    bh, np_len, d = qt.shape
    n_q = np_len // block_q
    grid = (bh, n_q)
    kernel = functools.partial(_attn_kernel, scale=scale, valid_len=np_len)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_len, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_len, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, np_len, d), qt.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * np_len * np_len * d,
            bytes_accessed=3 * bh * np_len * d * qt.dtype.itemsize
            + bh * np_len * d * qt.dtype.itemsize,
            transcendentals=bh * np_len * np_len,
        ),
        interpret=_interpret(),
    )(qt, kt, vt)


def _flash_masked(qt, kt, vt, scale: float, block_q: int, valid_len: int):
    """Variant where the padded tail of K must be masked (valid_len < NP)."""
    bh, np_len, d = qt.shape
    kernel = functools.partial(_attn_kernel, scale=scale, valid_len=valid_len)
    return pl.pallas_call(
        kernel,
        grid=(bh, np_len // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_len, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_len, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, np_len, d), qt.dtype),
        interpret=_interpret(),
    )(qt, kt, vt)


def flash_attention(q, k, v, scale: float, block_q: int = 256):
    """Fused attention over (B, N, H, D) tensors (non-causal, self-attn).

    Exact (fp32 softmax); returns (B, N, H, D) in q.dtype.
    """
    b, n, h, d = q.shape
    np_len = -(-n // block_q) * block_q
    pad = np_len - n

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, d)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    qt, kt, vt = prep(q), prep(k), prep(v)
    if pad:
        out = _flash_masked(qt, kt, vt, scale, block_q, valid_len=n)
    else:
        out = _flash_bhnd(qt, kt, vt, scale, block_q)
    out = out[:, :n, :].reshape(b, h, n, d)
    return jnp.transpose(out, (0, 2, 1, 3))
