"""Pallas direct-buffer KV attention for the streaming temporal modules.

Streaming context (reference video_depth_stream.py:134-140): each step, the
new frame's temporal attention reads a 31-entry KV context drawn from a
43-row ring buffer per cache slot.  The assembly-based path materializes
that context with a one-hot contraction (read ALL 43 rows ~1.2 GB, write the
31-row context ~0.9 GB), then the attention concats the new row and adds the
projected position encoding (another materialized (BHW, 32, C) round trip)
before the score/value einsums re-read it — ~4.5 ms of a ~20 ms step is
HBM traffic over the same bytes.

This kernel reads the ring buffers ONCE, in place:

  * grid tiles G=16 spatial positions x a head group; the (G*43, gw) K/V
    tiles stream through VMEM and never come back,
  * the 31-of-43 context selection AND the block-diagonal structure are ONE
    precomputed additive fp32 mask (0 on context entries of the right
    position block, -1e30 elsewhere) — no iota/select ops in the kernel,
  * the APE position encoding is a per-row pe table (gathered by the
    host-computed logical-position map, row-tiled to the K/V tile shape
    outside the kernel) added to the K/V tiles in VMEM,
  * scores for a whole G-position tile run as ONE full-width MXU pass per
    head, exactly like ops/pallas_attention's tiny-seq kernel: off-block
    exp() terms are 0, so the e @ V contraction over all G*43 rows is
    correct with no gather anywhere.

The new frame's K/V row (with its own PE pre-added by the caller) enters as
a separate (G, gw) operand with an identity-masked (G, G) score block, so
the (BHW, 32, C) concat never exists.

Numerics match the assembly path to bf16 reduction noise: PE adds happen in
bf16 on the same operands, scores/stats accumulate fp32, exp in bf16 —
the same recipe as the encoder attention kernel.

Only the steady-state protocol is supported (every context entry a DISTINCT
buffer row); during stream warmup the anchor row legitimately appears in the
context multiple times at different positions (the reference's replication
trick) and the caller must keep the assembly path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return os.environ.get("VDA_PALLAS_INTERPRET", "0") == "1"


ROW_TILE = 16  # G: spatial positions per grid cell (buffers padded to this)


def _stream_kv_kernel(q_ref, kn_ref, vn_ref, kb_ref, vb_ref, pe_k_ref,
                      pe_v_ref, mask_ref, eye_ref, o_ref, *, heads: int,
                      scale: float):
    """One (G positions, head-group) cell.

    q/kn/vn: (G, gw) — queries and the new frame's K/V (PE already added).
    kb/vb:   (G*rows, gw) — ring-buffer rows, position-major (row r of
             position g lives at g*rows + r).
    pe_k/pe_v: (G*rows, gw) — projected APE per buffer row, row-tiled by the
             wrapper (constant across the grid, DMA'd once).
    mask:    (G, G*rows) fp32 additive — 0 where column is a context row of
             the row's own position block, -1e30 elsewhere.
    eye:     (G, G) fp32 additive identity mask for the new-frame block.
    """
    gw = q_ref.shape[1]
    dh = gw // heads
    mask = mask_ref[...]
    eye = eye_ref[...]
    bf16 = vn_ref.dtype == jnp.bfloat16
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q_ref[:, sl]
        kh = kb_ref[:, sl] + pe_k_ref[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + mask  # (G, G*rows)
        sn = jax.lax.dot_general(
            qh, kn_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + eye   # (G, G)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True),
                        jnp.max(sn, axis=-1, keepdims=True))
        if bf16:
            e = jnp.exp((s - m).astype(jnp.bfloat16))
            en = jnp.exp((sn - m).astype(jnp.bfloat16))
        else:
            e = jnp.exp(s - m)
            en = jnp.exp(sn - m)
        z = (jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
             + jnp.sum(en.astype(jnp.float32), axis=-1, keepdims=True))
        vh = vb_ref[:, sl] + pe_v_ref[:, sl]
        o = jax.lax.dot_general(
            e.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o += jax.lax.dot_general(
            en.astype(vh.dtype), vn_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:, sl] = (o / z).astype(o_ref.dtype)


@functools.lru_cache(maxsize=16)
def _masks(g: int, rows: int):
    """Additive score masks: block-diagonal (G, G*rows) and identity (G, G).
    The per-step context-validity bias is OR'd in by the wrapper."""
    col_blk = np.arange(g * rows) // rows
    same = col_blk[None, :] == np.arange(g)[:, None]
    eye = np.eye(g, dtype=bool)
    return same, eye


def stream_kv_attention(q, k_new, v_new, k_buf, v_buf, pe_k, pe_v, valid,
                        heads: int, scale: float):
    """Attention of 1 new frame against ring-buffer rows + itself.

    q, k_new, v_new: (BHW_pad, C) — new frame's projections; the caller adds
    the new row's PE into all three (q = to_q(h + pe), k_new/v_new get the
    projected pe of position T-1).
    k_buf, v_buf: (BHW_pad, rows, C) pre-PE cached projections; BHW_pad must
    be a multiple of ROW_TILE (the streaming buffers are allocated padded).
    pe_k, pe_v: (rows, C) projected APE per buffer row (masked rows
    arbitrary — their scores are -1e30 regardless).
    valid: (rows,) bool — which rows participate (the 31-entry context).
    Returns (BHW_pad, C) attention output (pad rows garbage).
    """
    bhw, rows, c = k_buf.shape
    g = ROW_TILE
    assert bhw % g == 0, (bhw, g)
    dh = c // heads
    gw = min(c, 512)
    assert c % gw == 0 and gw % dh == 0
    n_groups = c // gw

    same, eye = _masks(g, rows)
    ok = jnp.asarray(same) & jnp.tile(jnp.asarray(valid, jnp.bool_), (g,))
    mask = jnp.where(ok, 0.0, -1e30).astype(jnp.float32)       # (G, G*rows)
    eye_m = jnp.where(jnp.asarray(eye), 0.0, -1e30).astype(jnp.float32)
    pe_k_tiled = jnp.tile(pe_k, (g, 1))                        # (G*rows, C)
    pe_v_tiled = jnp.tile(pe_v, (g, 1))

    kb = k_buf.reshape(bhw * rows, c)
    vb = v_buf.reshape(bhw * rows, c)
    kernel = functools.partial(_stream_kv_kernel, heads=gw // dh,
                               scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(bhw // g, n_groups),
        in_specs=[
            pl.BlockSpec((g, gw), lambda i, hg: (i, hg),
                         memory_space=pltpu.VMEM),              # q
            pl.BlockSpec((g, gw), lambda i, hg: (i, hg),
                         memory_space=pltpu.VMEM),              # k_new
            pl.BlockSpec((g, gw), lambda i, hg: (i, hg),
                         memory_space=pltpu.VMEM),              # v_new
            pl.BlockSpec((g * rows, gw), lambda i, hg: (i, hg),
                         memory_space=pltpu.VMEM),              # k_buf
            pl.BlockSpec((g * rows, gw), lambda i, hg: (i, hg),
                         memory_space=pltpu.VMEM),              # v_buf
            pl.BlockSpec((g * rows, gw), lambda i, hg: (0, hg),
                         memory_space=pltpu.VMEM),              # pe_k tiled
            pl.BlockSpec((g * rows, gw), lambda i, hg: (0, hg),
                         memory_space=pltpu.VMEM),              # pe_v tiled
            pl.BlockSpec((g, g * rows), lambda i, hg: (0, 0),
                         memory_space=pltpu.VMEM),              # mask
            pl.BlockSpec((g, g), lambda i, hg: (0, 0),
                         memory_space=pltpu.VMEM),              # eye
        ],
        out_specs=pl.BlockSpec((g, gw), lambda i, hg: (i, hg),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bhw, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bhw * rows * c,
            bytes_accessed=(2 * bhw * rows * c + 4 * bhw * c)
            * q.dtype.itemsize,
            transcendentals=bhw * (rows + 1) * heads,
        ),
        interpret=_interpret(),
    )(q, k_new, v_new, kb, vb, pe_k_tiled, pe_v_tiled, mask, eye_m)
