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


def _pick_block_q(np_len: int) -> int:
    """Largest q block whose fp32 score tile stays ~2 MB in VMEM (the packed
    kernel also keeps full-width q/k/v/out blocks resident, so the score
    scratch must leave room; 20 MB stack allocations fail at 16 MB VMEM)."""
    if np_len <= 512:
        return np_len
    for div in (2, 4, 8, 16):
        bq = np_len // div
        if np_len % div == 0 and bq % 16 == 0 and bq * np_len * 4 <= 2_200_000:
            return bq
    return 128


def _pick_head_group(heads: int, d: int, max_width: int = 512) -> int:
    """Heads per grid cell: the group width (g*d) must be a 128-lane multiple
    and no wider than ``max_width`` (512 measured ~5% faster than 256 at the
    vitl window shape — fewer grid cells, same HBM traffic, still VMEM-safe
    with double-buffered score tiles)."""
    if os.environ.get("VDA_ATTN_GW"):
        max_width = int(os.environ["VDA_ATTN_GW"])  # full-bench sweep knob
    candidates = [g for g in range(1, heads + 1)
                  if heads % g == 0 and (g * d) % 128 == 0]
    if not candidates:
        return heads
    fitting = [g for g in candidates if g * d <= max_width]
    return max(fitting) if fitting else min(candidates)


def _attn_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                        valid_len: int, heads: int):
    """Heads packed in the last (lane) dim: refs are (1, N, heads*dh).

    A static per-head loop keeps each head's (BQ, NB) scores in registers/
    VMEM while the q/k/v blocks are loaded once for all heads — no host-side
    transposes ever touch HBM.
    """
    q = q_ref[0]              # (BQ, H*D)
    k = k_ref[0]              # (NB, H*D)
    v = v_ref[0]
    d = q.shape[-1] // heads
    nb = k.shape[0]
    bf16 = v.dtype == jnp.bfloat16
    # hoisted once: each (BQ, NB) tile shares the key-padding mask
    mask = None
    if valid_len < nb:
        col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], nb),
                                       dimension=1)
        mask = col < valid_len

    def qk(h):
        return jax.lax.dot_general(
            q[:, h * d:(h + 1) * d], k[:, h * d:(h + 1) * d],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    # software-pipelined: head h+1's MXU logits are issued before head h's
    # VPU softmax, so the units overlap across the unrolled loop
    s_next = qk(0)
    for h in range(heads):
        s = s_next
        if h + 1 < heads:
            s_next = qk(h + 1)
        if mask is not None:
            s = jnp.where(mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        # exp in bf16 (its result feeds a bf16 matmul anyway); stats fp32
        e = jnp.exp((s - m).astype(jnp.bfloat16)) if bf16 else jnp.exp(s - m)
        z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        # normalization is deferred to the (BQ, D) output — ~20x less VPU
        # work than dividing the (BQ, NB) probability tile
        vh = v[:, h * d:(h + 1) * d]
        o = jax.lax.dot_general(
            e.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * d:(h + 1) * d] = (o / z).astype(o_ref.dtype)


def flash_attention_packed(q, k, v, heads: int, scale: float,
                           block_q: int | None = None):
    """Fused attention over head-packed (B, N, H*D) tensors.

    This is the layout the fused qkv projection naturally produces, so the
    only HBM-touching prep is a pad along N to the 128-lane granule
    (1370 -> 1408); no (B,H,N,D) transposes.
    """
    b, n, hd = q.shape
    d = hd // heads
    np_len = -(-n // 128) * 128
    if block_q is None:
        block_q = _pick_block_q(np_len)
    block_q = min(block_q, np_len)
    if np_len % block_q:
        block_q = 128

    # Head groups become a grid dim in the lane dimension; additionally cap
    # the group's K/V block at ~1.5 MB for long sequences so everything
    # (double-buffered) fits in the 16 MB VMEM budget.
    budget = 1_500_000
    max_w = min(512, max(128, budget // max(np_len * q.dtype.itemsize, 1)
                         // 128 * 128))
    g_heads = _pick_head_group(heads, d, max_w)
    gw = g_heads * d
    n_groups = hd // gw

    pad = np_len - n
    if pad:
        padding = ((0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
    n_q = np_len // block_q

    kernel = functools.partial(_attn_kernel_packed, scale=scale, valid_len=n,
                               heads=g_heads)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_groups, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, gw), lambda b_, g, i: (b_, i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_len, gw), lambda b_, g, i: (b_, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_len, gw), lambda b_, g, i: (b_, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, gw), lambda b_, g, i: (b_, i, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_len, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * n * hd,
            bytes_accessed=4 * b * n * hd * q.dtype.itemsize,
            transcendentals=b * n * n * heads,
        ),
        interpret=_interpret(),
    )(q, k, v)
    return out[:, :n] if pad else out


def _attn_proj_kernel(q_ref, qkv_hbm, w_hbm, gb_ref, x_ref, o_ref,
                      k_scr, v_scr, w_scr, ofull_ref, sems, *,
                      scale: float, valid_len: int, heads: int):
    """Attention + out-projection epilogue in one kernel (VERDICT r4 #7).

    Identical per-head software-pipelined attention to ``_attn_kernel_packed``
    but over ALL heads (single group), followed in-VMEM by the block's
    out-projection, LayerScale and residual add:

        o_ref = x_ref + gamma * (attn(q,k,v) @ W + b)

    so the (B, N, C) attention output never round-trips HBM between the
    attention and the projection (reference block.py:82-107 runs these as
    separate modules).  gb_ref packs [gamma; bias] as a (2, C) fp32 array.

    K, V and the projection weight are SINGLE-buffered: the automatic
    BlockSpec pipeline double-buffers every operand, and at the production
    np=1408/C=1024 shape full-width K+V (11.5 MB) + W (4 MB) double-buffered
    blew the 16 MB scoped-VMEM budget (measured 21.69 MB, r5).  Instead the
    batch row's K/V lanes and W are DMA'd from HBM into persistent scratch
    once per batch index (i == 0); the blocking wait costs ~7 us per batch
    row against ~ms of attention compute, and the resident set drops to
    ~12 MB.
    """
    q = q_ref[0]              # (BQ, H*D)
    d = q.shape[-1] // heads
    hd = q.shape[-1]
    b_idx = pl.program_id(0)
    i_idx = pl.program_id(1)

    @pl.when(i_idx == 0)
    def _load():  # noqa: ANN202 — pallas conditional block
        cp_k = pltpu.make_async_copy(
            qkv_hbm.at[b_idx, :, pl.ds(hd, hd)], k_scr, sems.at[0])
        cp_v = pltpu.make_async_copy(
            qkv_hbm.at[b_idx, :, pl.ds(2 * hd, hd)], v_scr, sems.at[1])
        # W is grid-constant; re-copying it per batch row (2 MB x B) is
        # noise next to keeping a second 2 MB pipeline buffer resident
        cp_w = pltpu.make_async_copy(w_hbm, w_scr, sems.at[2])
        cp_k.start()
        cp_v.start()
        cp_w.start()
        cp_k.wait()
        cp_v.wait()
        cp_w.wait()

    k = k_scr[...]            # (NP, H*D)
    v = v_scr[...]
    nb = k.shape[0]
    bf16 = v.dtype == jnp.bfloat16
    mask = None
    if valid_len < nb:
        col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], nb),
                                       dimension=1)
        mask = col < valid_len

    def qk(h):
        return jax.lax.dot_general(
            q[:, h * d:(h + 1) * d], k[:, h * d:(h + 1) * d],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    s_next = qk(0)
    for h in range(heads):
        s = s_next
        if h + 1 < heads:
            s_next = qk(h + 1)
        if mask is not None:
            s = jnp.where(mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(jnp.bfloat16)) if bf16 else jnp.exp(s - m)
        z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        vh = v[:, h * d:(h + 1) * d]
        o = jax.lax.dot_general(
            e.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ofull_ref[:, h * d:(h + 1) * d] = (o / z).astype(ofull_ref.dtype)
    # epilogue: out-projection + LayerScale + residual, all resident in VMEM
    proj = jax.lax.dot_general(
        ofull_ref[...], w_scr[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gamma = gb_ref[0]
    bias = gb_ref[1]
    o_ref[0] = (x_ref[0].astype(jnp.float32)
                + gamma * (proj + bias)).astype(o_ref.dtype)


def attn_proj_fits(n: int, heads: int, dh: int, itemsize: int = 2) -> bool:
    """Static guard: the fused attention+projection kernel holds full-width
    K and V plus the (C, C) projection weight in VMEM; engage only when that
    resident set is comfortably inside the 16 MB budget (vitl C=1024 fits,
    vitg C=1536 does not — its K alone is 4.3 MB before double-buffering)."""
    hd = heads * dh
    np_len = n if n % 16 == 0 else -(-n // 128) * 128
    resident = 2 * np_len * hd * itemsize + hd * hd * itemsize
    return hd <= 1024 and dh % 8 == 0 and resident <= 8_000_000


def flash_attention_qkv_proj(qkv, w, gamma_bias, x_res, heads: int,
                             scale: float, valid_len: int | None = None,
                             block_q: int | None = None):
    """Fused attention + out-projection + LayerScale + residual.

    qkv: (B, N, 3C) fused-projection output ([q|k|v] lanes, reference
    dinov2_layers/attention.py:44,51); w: (C, C) projection weight;
    gamma_bias: (2, C) fp32 [LayerScale gamma; projection bias]; x_res:
    (B, N, C) residual input.  Returns x_res + gamma*(attn@W + b), i.e. the
    whole first half of a pre-norm ViT block after norm1 — saving the
    attention output's HBM round trip and the residual's extra read per
    block vs the split path (~184 MB/layer at the vitl window shape).

    Single head group: the out-projection contracts over ALL heads, so head
    groups would turn the grid's group dim into a reduction Pallas can't
    revisit non-consecutively; instead all heads stay in one cell (resident
    K/V fits for C<=1024 per ``attn_proj_fits``).
    """
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // heads
    if valid_len is None:
        valid_len = n
    np_len = n if n % 16 == 0 else -(-n // 128) * 128
    if block_q is None and os.environ.get("VDA_ATTN_BQ"):
        block_q = int(os.environ["VDA_ATTN_BQ"])
    if block_q is None:
        block_q = np_len
        if np_len > 768:
            best = None
            for div in range(2, np_len // 16 + 1):
                if np_len % div:
                    continue
                bq = np_len // div
                if bq % 16 or bq * np_len * 4 > 2_200_000:
                    continue
                if best is None or abs(bq - 176) < abs(best - 176):
                    best = bq
            block_q = best if best is not None else (
                128 if np_len % 128 == 0 else 16)
    block_q = min(block_q, np_len)
    if np_len % block_q:
        block_q = 128 if np_len % 128 == 0 else 16

    pad = np_len - n
    if pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, pad), (0, 0)))
        x_res = jnp.pad(x_res, ((0, 0), (0, pad), (0, 0)))
    n_q = np_len // block_q

    kernel = functools.partial(_attn_proj_kernel, scale=scale,
                               valid_len=valid_len, heads=heads)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # qkv: K/V lanes DMA'd
            pl.BlockSpec(memory_space=pltpu.ANY),   # W: DMA'd once per row
            pl.BlockSpec((2, hd), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, hd), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_len, hd), x_res.dtype),
        scratch_shapes=[
            pltpu.VMEM((np_len, hd), qkv.dtype),    # K (single-buffered)
            pltpu.VMEM((np_len, hd), qkv.dtype),    # V
            pltpu.VMEM((hd, hd), w.dtype),          # W
            pltpu.VMEM((block_q, hd), qkv.dtype),   # per-block attn output
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * valid_len * valid_len * hd
            + 2 * b * np_len * hd * hd,
            bytes_accessed=(3 + 2) * b * n * hd * qkv.dtype.itemsize
            + hd * hd * qkv.dtype.itemsize,
            transcendentals=b * valid_len * valid_len * heads,
        ),
        interpret=_interpret(),
    )(qkv, qkv, w, gamma_bias, x_res)
    return out[:, :n] if pad else out


def flash_attention_qkv(qkv, heads: int, scale: float,
                        block_q: int | None = None,
                        valid_len: int | None = None):
    """Fused attention DIRECTLY on the fused-qkv projection output.

    qkv: (B, N, 3*H*D) laid out [q | k | v] (the torch fused-qkv convention,
    reference dinov2_layers/attention.py:44,51).  The q/k/v views are three
    BlockSpecs into the SAME array at different lane offsets, so between the
    qkv matmul and the attention kernel zero copies touch HBM.

    valid_len: when the caller already runs padded (N % 128 == 0 with only
    the first valid_len tokens real — see models/dinov2.py padded-encoder
    path), keys/queries beyond it are masked here and no pad op is emitted.
    Padding qkv per layer costs ~0.7 ms at the vitl window shape; padding
    once outside pays it once for 24 layers.
    """
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // heads
    if valid_len is None:
        valid_len = n
    # a 16-aligned caller-padded length runs as-is (the scores' internal
    # lane pad to the next 128 multiple is Mosaic's, costing the same MXU
    # lane-tile count); anything else pads to the 128 lane granule
    np_len = n if n % 16 == 0 else -(-n // 128) * 128
    if block_q is None and os.environ.get("VDA_ATTN_BQ"):
        block_q = int(os.environ["VDA_ATTN_BQ"])  # full-bench sweep knob
    # Tuning (v5e, ViT shape 32x1408x16x64, round 2): with 8-head (512-lane)
    # groups, 8 q-blocks of 176 rows run 85.4 TF/s vs 70.9 for 4x352 —
    # the smaller fp32 score tile (176x1408, <1 MB) overlaps the per-head
    # softmax with the next block's matmuls; matmul-only measures 81.6,
    # so this is at the dh=64 ceiling.
    if block_q is None:
        block_q = np_len
        if np_len > 768:
            # every divisor with 16-aligned rows and a score tile under the
            # VMEM budget; nearest to the tuned 176-row sweet spot wins
            # (v5e sweep, see the tuning note above)
            best = None
            for div in range(2, np_len // 16 + 1):
                if np_len % div:
                    continue
                bq = np_len // div
                if bq % 16 or bq * np_len * 4 > 4_200_000:
                    continue
                if best is None or abs(bq - 176) < abs(best - 176):
                    best = bq
            # no usable divisor (e.g. np_len 4480 at input_size ~900):
            # degrade to a fixed small block instead of a full (N, N) fp32
            # tile that blows the 16 MB VMEM stack at compile time.
            # MEASURED DEAD END (r3): a RAGGED ceil-div grid (bq=176 over
            # np_len=1376, final block masked) is exact in interpreter mode
            # but HANGS the remote Mosaic compile at real shapes — do not
            # re-try non-dividing q blocks on this toolchain.
            block_q = best if best is not None else (
                128 if np_len % 128 == 0 else 16)
    block_q = min(block_q, np_len)
    if np_len % block_q:
        block_q = 128 if np_len % 128 == 0 else 16

    # same ~1.5 MB K/V-block budget as flash_attention_packed: at the
    # production vitl shape (np_len 1376/1408) this still yields the tuned
    # 512-lane (8-head) groups, but at long sequences (np_len ~4480 at
    # input_size ~900) it shrinks the group so double-buffered K+V blocks
    # stay inside the 16 MB VMEM stack instead of failing the Mosaic compile
    budget = 1_500_000
    max_w = min(512, max(128, budget // max(np_len * qkv.dtype.itemsize, 1)
                         // 128 * 128))
    g_heads = _pick_head_group(heads, d, max_w)
    gw = g_heads * d
    n_groups = hd // gw

    pad = np_len - n
    if pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, pad), (0, 0)))
    n_q = np_len // block_q

    kernel = functools.partial(_attn_kernel_packed, scale=scale,
                               valid_len=valid_len, heads=g_heads)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_groups, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, gw), lambda b_, g, i: (b_, i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_len, gw),
                         lambda b_, g, i, ng=n_groups: (b_, 0, ng + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_len, gw),
                         lambda b_, g, i, ng=n_groups: (b_, 0, 2 * ng + g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, gw), lambda b_, g, i: (b_, i, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_len, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * valid_len * valid_len * hd,
            bytes_accessed=(3 + 1) * b * n * hd * qkv.dtype.itemsize,
            transcendentals=b * valid_len * valid_len * heads,
        ),
        interpret=_interpret(),
    )(qkv, qkv, qkv)
    return out[:, :n] if pad else out


def _tiny_seq_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq: int,
                     heads: int):
    """Per-position temporal attention over tiny sequences.

    Refs are (ROWS, H*D) where ROWS = G*seq flattened (position-major) — each
    consecutive ``seq`` rows form one independent attention problem.  Scores
    for a whole G-position tile are computed in ONE full-width MXU pass per
    head with a static block-diagonal mask (off-block = -inf), so the extra
    flops are free relative to thousands of (seq, d) batched matmuls, and the
    (ROWS, ROWS) score tile never touches HBM.
    """
    rows = q_ref.shape[0]
    d = q_ref.shape[-1] // heads
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // seq
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // seq
    same = row_blk == col_blk
    for h in range(heads):
        qh = q_ref[:, h * d:(h + 1) * d]
        kh = k_ref[:, h * d:(h + 1) * d]
        vh = v_ref[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(same, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(vh.dtype)) if vh.dtype == jnp.bfloat16 \
            else jnp.exp(s - m)
        z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:, h * d:(h + 1) * d] = (o / z).astype(o_ref.dtype)


def _pick_rows_per_tile(c: int, itemsize: int, seq: int) -> int:
    """Largest power-of-two row tile whose scoped-VMEM stack fits.

    The kernel's live set is 4 I/O tiles double-buffered (8*tile*c*itemsize)
    plus the (tile, tile) score-block temporaries — fp32 scores, bf16 exp,
    two int32 iotas and the bool mask, ~19 B/element measured (the Mosaic
    compile of c=1536/tile=512 allocates 17.2 MB against the 16 MB limit;
    the I/O term alone is 12.6 MB).  512 is the measured-optimal tile at
    vitl shapes (see tiny_seq_attention docstring) and is kept whenever it
    fits under a 14 MB budget (2 MB headroom)."""
    tile = 512
    while tile > seq and (8 * tile * c * itemsize + 19 * tile * tile
                          > 14 * 2 ** 20):
        tile //= 2
    return max(tile, seq)


def tiny_seq_attention(q, k, v, heads: int, seq: int, scale: float,
                       rows_per_tile: int = 0):
    """Batched self-attention over (BD, seq, C) with seq <= 64.

    Replaces the temporal-attention einsum (reference
    motion_module/attention.py:182-211 math): thousands of tiny batched
    matmuls run at ~3 TF/s on the MXU; tiling G positions per kernel cell
    with an in-VMEM block-diagonal mask recovers full-width passes.

    rows_per_tile: 0 (default) picks the largest VMEM-feasible tile
    (_pick_rows_per_tile) — 512 at every vits/vitb/vitl shape, 256 at
    vitg's C=1536 modules where 512's stack overflows scoped VMEM.
    v5e sweep at the vitl mm3 shape (5476x32x256, dh 32):
    64 -> 3.26 ms, 128 -> 3.34, 256 -> 4.00, 512 -> 2.93.  The kernel is
    matmul-bound at the K=dh=32 contraction (quarter-MXU ceiling), so the
    larger M tile wins despite the wider masked region.
    """
    bd, t, c = q.shape
    assert t == seq
    if not rows_per_tile:
        rows_per_tile = _pick_rows_per_tile(c, q.dtype.itemsize, seq)
    g = max(rows_per_tile // seq, 1)
    tile = g * seq
    pad_bd = (-bd) % g
    if pad_bd:
        padding = ((0, pad_bd), (0, 0), (0, 0))
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
    total = (bd + pad_bd) * seq
    qf = q.reshape(total, c)
    kf = k.reshape(total, c)
    vf = v.reshape(total, c)

    kernel = functools.partial(_tiny_seq_kernel, scale=scale, seq=seq,
                               heads=heads)
    out = pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * total * seq * c,
            bytes_accessed=4 * total * c * q.dtype.itemsize,
            transcendentals=total * seq * heads,
        ),
        interpret=_interpret(),
    )(qf, kf, vf)
    out = out.reshape(bd + pad_bd, seq, c)
    return out[:bd] if pad_bd else out


def _plan_segments(segment_lengths, min_cap: int = 128):
    """Static bin-packing of variable-length segments into lane-aligned bins.

    Returns (cap, bins) where bins is a list of [(seg_idx, start_slot), ...]
    and cap is the per-bin row capacity (multiple of 128 so the in-kernel
    (cap, cap) score tile is lane-aligned).  Order-preserving greedy packing:
    the TPU equivalent of xFormers BlockDiagonalMask.from_seqlens (reference
    dinov2_layers/block.py:159-179) — static shapes, one kernel cell per bin.
    """
    lengths = [int(l) for l in segment_lengths]
    if not lengths or min(lengths) <= 0:
        raise ValueError("segment_lengths must be positive")
    cap = max(min_cap, -(-max(lengths) // 128) * 128)
    bins, cur, used = [], [], 0
    for si, ln in enumerate(lengths):
        if used + ln > cap:
            bins.append(cur)
            cur, used = [], 0
        cur.append((si, used))
        used += ln
    bins.append(cur)
    return cap, bins


def _segment_kernel(bounds_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                    heads: int, n_bounds: int):
    """Block-diagonal attention inside one bin.

    bounds_ref (SMEM, (1, n_bounds)): segment start slots of this bin plus an
    end-of-data sentinel, padded by repeating the sentinel.  Row/col segment
    ids are recovered as id(r) = sum_s [r >= bounds_s]; pad rows get an id
    past every real segment, so they only attend to themselves (garbage rows,
    sliced away by the caller's inverse gather).
    """
    c, hd = q_ref.shape
    d = hd // heads
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    qid = jnp.zeros((c, c), jnp.int32)
    kid = jnp.zeros((c, c), jnp.int32)
    for s in range(n_bounds):
        b = bounds_ref[0, s]
        qid += (row >= b).astype(jnp.int32)
        kid += (col >= b).astype(jnp.int32)
    same = qid == kid
    bf16 = v_ref.dtype == jnp.bfloat16
    for h in range(heads):
        qh = q_ref[:, h * d:(h + 1) * d]
        kh = k_ref[:, h * d:(h + 1) * d]
        vh = v_ref[:, h * d:(h + 1) * d]
        s_ = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s_ = jnp.where(same, s_, -jnp.inf)
        m = jnp.max(s_, axis=-1, keepdims=True)
        e = jnp.exp((s_ - m).astype(jnp.bfloat16)) if bf16 else jnp.exp(s_ - m)
        z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:, h * d:(h + 1) * d] = (o / z).astype(o_ref.dtype)


def segment_attention(q, k, v, heads: int, scale: float, segment_lengths):
    """Variable-length packed self-attention (NestedTensorBlock equivalent).

    q/k/v: (total, H*D) rows of ``len(segment_lengths)`` back-to-back
    sequences; attention never crosses a segment boundary.  This is the
    TPU-native replacement for the reference's xFormers BlockDiagonalMask
    batching (reference dinov2_layers/block.py:204-252): segments are
    statically bin-packed into lane-aligned bins (one grid cell each), and a
    segment-id mask computed from SMEM boundaries keeps the math exact.

    segment_lengths must be static (python ints) — like the reference, which
    caches one attn_bias per shape tuple (block.py:156-179).
    """
    import numpy as np

    total, hd = q.shape
    d = hd // heads
    lengths = [int(l) for l in segment_lengths]
    if sum(lengths) != total:
        raise ValueError(f"segment_lengths sum {sum(lengths)} != rows {total}")
    cap, bins = _plan_segments(lengths)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    n_bins = len(bins)
    n_bounds = max(len(b) for b in bins) + 1  # starts + end sentinel

    gather = np.full((n_bins, cap), total, np.int32)  # `total` = fill row
    bounds = np.full((n_bins, n_bounds), cap, np.int32)
    inv = np.empty((total,), np.int32)
    for bi, segs in enumerate(bins):
        for sj, (si, start) in enumerate(segs):
            ln = lengths[si]
            gather[bi, start:start + ln] = np.arange(
                offsets[si], offsets[si] + ln, dtype=np.int32)
            inv[offsets[si]:offsets[si] + ln] = bi * cap + np.arange(
                start, start + ln, dtype=np.int32)
            bounds[bi, sj] = start
        end = segs[-1][1] + lengths[segs[-1][0]]
        bounds[bi, len(segs)] = end

    gather_idx = jnp.asarray(gather.reshape(-1))
    binned = [jnp.take(t, gather_idx, axis=0, mode="fill", fill_value=0)
              for t in (q, k, v)]

    # 256-lane cap here, NOT the qkv kernel's 512: this kernel has no
    # q-blocking — each grid cell holds the whole (cap, cap) fp32 score tile
    # per unrolled head, and doubling the group doubles the live tiles
    # against the 16 MB VMEM stack (CLAUDE.md)
    g_heads = _pick_head_group(heads, d, max_width=256)
    gw = g_heads * d
    n_groups = hd // gw

    kernel = functools.partial(_segment_kernel, scale=scale, heads=g_heads,
                               n_bounds=n_bounds)
    out = pl.pallas_call(
        kernel,
        grid=(n_bins, n_groups),
        in_specs=[
            pl.BlockSpec((1, n_bounds), lambda b, g: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((cap, gw), lambda b, g: (b, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, gw), lambda b, g: (b, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, gw), lambda b, g: (b, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cap, gw), lambda b, g: (b, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_bins * cap, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * sum(l * l for l in lengths) * hd,
            bytes_accessed=4 * total * hd * q.dtype.itemsize,
            transcendentals=sum(l * l for l in lengths) * heads,
        ),
        interpret=_interpret(),
    )(jnp.asarray(bounds), *binned)
    return jnp.take(out, jnp.asarray(inv), axis=0)


def flash_attention(q, k, v, scale: float, block_q: int | None = None):
    """Fused attention over (B, N, H, D) tensors (non-causal, self-attn).

    Exact (fp32 softmax); returns (B, N, H, D) in q.dtype.  Thin wrapper over
    the head-packed kernel (the (B,N,H,D)->(B,N,H*D) reshape is free).
    """
    b, n, h, d = q.shape
    out = flash_attention_packed(q.reshape(b, n, h * d),
                                 k.reshape(b, n, h * d),
                                 v.reshape(b, n, h * d),
                                 heads=h, scale=scale, block_q=block_q)
    return out.reshape(b, n, h, d)
