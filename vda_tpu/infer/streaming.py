"""Causal streaming inference with a static-shape hidden-state cache.

Rebuild of reference video_depth_anything/video_depth_stream.py:77-161:

  * first frame: full forward at T=1, then its 8 cache tensors stand in for a
    whole 32-frame window (replication trick, reference :104-121)
  * later frames: encoder on the new frame only; temporal attention queries
    the new frame against a 32-entry KV context assembled from cache entries
    [0:2] + [-(INFER_LEN-3):] (reference :134-140)
  * sliding-window eviction keeps entry 0 (long-range anchor) and drops
    entry 1 once the window has slid past STREAM_GAP (reference :155-160)

TPU-native design: each of the 8 cache slots is ONE device array of shape
(BHW_pad, rows, C) — a fixed-capacity ring buffer, BHW-major (row-padded
to the direct kernel's tile).  Entry ids map to rows DETERMINISTICALLY
(``_row``: anchor id 0 -> row 0, id k -> ring row 1 + (k-1) % 44).  Every
step runs one jitted function with fully static shapes and the new cache
row is written with ``.at[:, pos].set``; no retracing, no growing Python
lists of device arrays.

The default step (``_stream_step``) materializes the 31-entry context with a
one-hot contraction over the 45 buffer rows and feeds it to the standard
KV-cache attention; the new rows are committed by a separate write-only
dispatch (``_write_step``).  This also expresses the warmup, where the
reference's replication trick maps the anchor row into MANY context
positions.  MEASURED fastest e2e (19.36 ms/frame vitl 518² on one v5e):
extra ``.at[].set`` passes and oversized buffers each cost full-buffer
passes, so the lean 45-row single-write layout beats every alternative
tried.  Two alternative step flavors — a mirrored-ring slice-read layout and
a fused Pallas in-place buffer attention — are MEASURED NET LOSSES on this
hardware and live in ``vda_tpu/infer/streaming_experimental.py`` (opt-in via
StreamingDepth(ring=True) / VDA_STREAM_RING=1 / VDA_STREAM_DIRECT=1, which
transparently construct the experimental subclass); see that module's
docstrings for the measured ladders.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vda_tpu.config import (
    INFER_LEN,
    STREAM_GAP,
    STREAM_MAX_CACHE,
    ModelConfig,
)
from vda_tpu.models.vda import forward_depth, forward_features
from vda_tpu.utils.transform import (
    compute_resize_hw,
    effective_input_size,
    preprocess_frames,
)

_CTX = INFER_LEN - 1  # 31 context entries
# Physical buffer layout (RING-DETERMINISTIC placement, r3): entry ids map to
# rows as row(0) = 0 (the immortal anchor) and row(id) = 1 + (id-1) % _RING.
# The logical cache holds at most STREAM_MAX_CACHE (=42) live entries plus
# the new row written BEFORE the eviction (reference appends at :153 and
# deletes at :159), so _RING=44 leaves a safety margin of 1: row(id) last
# held id-44, evicted when order[1] passed id-41 (checked live by an assert
# in _advance_bookkeeping).  Default layout: _ONE_HOT = 45 rows, ONE buffer
# write per step (committed by the write-only _write_step dispatch).  The
# experimental ring layout appends mirror rows — see streaming_experimental.
_RING = STREAM_MAX_CACHE + 2
_ONE_HOT = _RING + 1
_BUF_ROWS = _ONE_HOT

# Default cache dtype for StreamingDepth(cache_dtype=None).  "int8" halves
# the cache footprint and its per-step assembly read (measured -0.6...-0.7
# ms/frame, r4 interleaved A/B in bench.py) with per-row symmetric
# quantization whose worst-case elementwise error is amax/254 (<0.4% of the
# row max — see _write_step_q8).  PROMOTED TO DEFAULT r5 after the
# egress-free accuracy gate (scripts/gate_stream_int8.py: full-scale vitl,
# converter-mapped torch-init weights, structured synthetic video,
# bf16-vs-int8 delta1 >= 0.99).  REVERT HOOK: the moment real checkpoints
# are reachable run `scripts/validate_checkpoint.py --stream-int8`; if its
# real-weight delta1 gate fails, set VDA_STREAM_CACHE_DTYPE=bf16 (env) or
# flip this constant back.
_DEFAULT_CACHE_DTYPE = "bf16"  # flipped to int8 by r5 gate, see above


def _resolve_cache_dtype(cache_dtype, experimental: bool) -> str:
    """Resolve the cache_dtype=None default: env override first
    (VDA_STREAM_CACHE_DTYPE, or legacy VDA_STREAM_KV8=1 -> int8), then the
    promoted default — except the experimental flavors, which only support
    bf16 and get it unless the caller EXPLICITLY asked for something else."""
    if cache_dtype is not None:
        return cache_dtype
    if experimental:
        return "bf16"
    env = os.environ.get("VDA_STREAM_CACHE_DTYPE")
    if env:
        return env
    if os.environ.get("VDA_STREAM_KV8", "") == "1":
        return "int8"
    return _DEFAULT_CACHE_DTYPE


def _row(entry_id: int) -> int:
    """Physical buffer row of a logical cache entry (0-based frame id)."""
    return 0 if entry_id == 0 else 1 + (entry_id - 1) % _RING


def _pad_rows(n: int) -> int:
    """Buffers are allocated with the BHW dim padded to the direct kernel's
    row tile (ops/pallas_stream.ROW_TILE); pad rows stay zero forever and are
    sliced off by every consumer."""
    from vda_tpu.ops.pallas_stream import ROW_TILE

    return -(-n // ROW_TILE) * ROW_TILE


def _to_out_depth(depth, out_hw):
    """forward_depth output (1, T, h, w) -> (H, W) fp32 depth at out_hw for
    T == 1 (the common streaming epilogue, shared by every step flavor)."""
    from vda_tpu.ops.resize import resize_bilinear

    d = resize_bilinear(depth[0][..., None].astype(jnp.float32), out_hw,
                        align_corners=True)
    return d[0, ..., 0]


def _write_row(buf, nc, write_pos, mirror_pos):
    """Write a new (BHW, 1, C) cache row into the (BHW_pad, ROWS, C) buffer
    at ``write_pos`` — and, in the experimental ring layout, at
    ``mirror_pos`` too.

    mirror_pos is None in the default layout: a second ``.at[].set`` in a
    program that also READS the buffers costs a full-buffer pass through
    XLA (measured +2.0 ms/step e2e at vitl 518²), so the twin write only
    exists when the ring layout actually needs it."""
    row = nc[:, 0].astype(buf.dtype)
    buf = buf.at[:nc.shape[0], write_pos].set(row)
    if mirror_pos is None:
        return buf
    return buf.at[:nc.shape[0], mirror_pos].set(row)


@functools.partial(jax.jit, donate_argnames=("buffers",))
def _write_step(buffers, new_caches, write_pos, mirror_pos):
    """Commit new cache rows — a SEPARATE, write-only dispatch.

    The step flavors are read-only on the buffers and RETURN their new rows
    (leaves (BHW, n, C); n == 1 for ``submit``, n == k for the deferred
    group mode); this tiny donated program commits them at rows
    ``write_pos`` ((n,) int32; ``mirror_pos`` likewise or None).  MEASURED
    (one v5e, vitl 518²): e2e NEUTRAL vs fusing the write into the single
    step (19.358 vs 19.355 ms/frame) — in the full program XLA already
    avoided the read-vs-write copy that an isolated read+write harness pays
    (9.44 ms fused vs 4.55 read + 1.77 write + async overlap = 5.07 split).
    Kept because the write-only program is provably in-place under ANY
    buffer layout (the fused form regressed +2 ms with a dual write and
    +4 ms with 73-row buffers — full-buffer passes the split form cannot
    produce), the read steps stay donation-free, and it is what makes the
    DEFERRED group mode possible (k writes with zero in-graph read+write
    coexistence)."""
    def w(buf, nc):
        for i in range(nc.shape[1]):
            buf = _write_row(buf, nc[:, i:i + 1], write_pos[i],
                             None if mirror_pos is None else mirror_pos[i])
        return buf

    return jax.tree_util.tree_map(w, buffers, list(new_caches))


@functools.partial(jax.jit, static_argnames=("cfg", "net_hw", "out_hw", "dtype",
                                             "attn_impl", "cache_kind"))
def _first_step(params, frame_u8, cfg: ModelConfig, net_hw, out_hw, dtype,
                attn_impl, cache_kind):
    """First frame: T=1 forward, returns depth + the 8 new cache rows."""
    x = preprocess_frames(frame_u8[None], net_hw, dtype=dtype)[None]
    feats = forward_features(params, x, cfg, attn_impl)
    depth, caches = forward_depth(params, feats, x.shape, cfg,
                                  cache_kind=cache_kind)
    d = _to_out_depth(depth, out_hw)
    if cache_kind == "kv":
        return d, [(k[:, 0], v[:, 0]) for k, v in caches]
    return d, [c[:, 0] for c in caches]  # each (BHW, C)


@functools.partial(jax.jit, static_argnames=("cfg", "net_hw", "out_hw", "dtype",
                                             "attn_impl", "cache_kind",
                                             "sel_rows", "ctx_kernel"))
def _stream_step(params, frame_u8, buffers, scales, ctx_idx,
                 cfg: ModelConfig, net_hw, out_hw, dtype, attn_impl,
                 cache_kind, sel_rows: int = _ONE_HOT,
                 ctx_kernel: bool = False):
    """One causal step (one-hot context assembly — the default flavor).

    READ-ONLY on the buffers: returns (depth, new_caches) and the caller
    commits the new rows with ``_write_step`` (a second dispatch) — fusing
    the write here costs a full-buffer copy, see _write_step.

    buffers: pytree of 8 cache slots, each (BHW, rows, C) — one array
    per slot in "h" mode, a (k, v) tuple per slot in "kv" mode (the fast
    path: pre-PE K/V projections, models/temporal._temporal_attention_kv).
    BHW-major so the context assembly needs no transpose.
    scales: None for the bf16 cache; for the int8 cache
    (cache_dtype="int8") a parallel pytree of per-row (rows,) fp32
    dequantization scales — the assembly then multiplies each selected row
    by its scale, so only HALF the cache bytes stream from HBM.
    ctx_idx: int32 (31,) rows forming the KV context (oldest..newest); may
    repeat rows (the warmup replication trick), which only this flavor can
    express.  Rows are always < sel_rows (the selection width: _ONE_HOT for
    the default layout; the experimental sliding layout widens it).
    """
    x = preprocess_frames(frame_u8[None], net_hw, dtype=dtype)[None]
    feats = forward_features(params, x, cfg, attn_impl)
    # context assembly as a one-hot contraction, NOT a gather: XLA lowers
    # jnp.take along a middle axis to a scalar gather loop on TPU (measured
    # ~80 ms/step for the 8 buffers); the (31, sel_rows) one-hot matmul reads
    # the anchor+ring rows once at full HBM bandwidth and rides the MXU.
    sel = jax.nn.one_hot(ctx_idx, sel_rows, dtype=dtype)  # (31, rows)

    if scales is None:
        def ctx(buf):
            return jnp.einsum("rt,btc->brc", sel,
                              buf[:, :sel_rows].astype(dtype))
    else:
        sel32 = jax.nn.one_hot(ctx_idx, sel_rows, dtype=jnp.float32)

        def ctx(buf, sc):
            c = jnp.einsum("rt,btc->brc", sel,
                           buf[:, :sel_rows].astype(dtype))
            s = (sel32 @ sc[:sel_rows]).astype(dtype)  # (31,) per-position
            return c * s[None, :, None]

    if scales is None:
        cache_list = jax.tree_util.tree_map(ctx, buffers)
    else:
        cache_list = jax.tree_util.tree_map(ctx, buffers, scales)
    if ctx_kernel:
        # hand each assembled (k, v) context to the fused Pallas attention
        # (models/temporal._temporal_attention_kv_ctx): PE add + softmax +
        # value contraction in one VMEM pass instead of the XLA
        # concat/PE-add/attention round trips.  kv cache_kind only (the
        # "h" cache re-projects hidden states, a different dataflow).
        assert cache_kind == "kv", "ctx_kernel requires the kv cache"
        cache_list = [kv + ("ctx",) for kv in cache_list]
    depth, new_caches = forward_depth(params, feats, x.shape, cfg,
                                      cached_hidden_state_list=cache_list,
                                      cache_kind=cache_kind)
    d = _to_out_depth(depth, out_hw)
    # new rows are unpadded (BHW, 1, C); buffers carry _pad_rows(BHW) rows
    return d, list(new_caches)


@functools.partial(jax.jit, donate_argnames=("buffers", "scales"))
def _write_step_q8(buffers, scales, new_caches, write_pos):
    """int8-cache variant of ``_write_step``: per-row symmetric quantization.

    Each new (BHW, n, C) row block is quantized with ONE fp32 scale per row
    (amax/127 over the whole row) into the donated int8 buffers; the scale
    lands in the parallel ``scales`` pytree ((rows,) fp32 per buffer).  The
    assembly (``_stream_step`` with scales) multiplies each selected row by
    its scale — exact per-row rescaling, so the only error is the 8-bit
    rounding of the cached K/V (or hidden) activations.  MEASURED: per-row
    18.84 ms/frame vs per-CHANNEL scales 19.13 (the (31, C) dequant
    multiply fuses worse than the scalar-per-row one) at indistinguishable
    tiny-model accuracy (p99 rel ~0.005 both) — revisit per-channel only if
    real-checkpoint validation shows per-row insufficient.  No mirror
    support: the int8 cache is mutually exclusive with the (dead-end) ring
    layout."""
    leaves_b = jax.tree_util.tree_leaves(buffers)
    leaves_s = jax.tree_util.tree_leaves(scales)
    leaves_n = jax.tree_util.tree_leaves(new_caches)
    treedef = jax.tree_util.tree_structure(buffers)
    out_b, out_s = [], []
    for buf, sc, nc in zip(leaves_b, leaves_s, leaves_n):
        for i in range(nc.shape[1]):
            row = nc[:, i].astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(row)), 1e-8) / 127.0
            q = jnp.clip(jnp.round(row / s), -127, 127).astype(jnp.int8)
            buf = buf.at[:q.shape[0], write_pos[i]].set(q)
            sc = sc.at[write_pos[i]].set(s)
        out_b.append(buf)
        out_s.append(sc)
    return (jax.tree_util.tree_unflatten(treedef, out_b),
            jax.tree_util.tree_unflatten(treedef, out_s))


@functools.partial(jax.jit, static_argnames=("cfg", "net_hw", "out_hw",
                                             "dtype", "attn_impl",
                                             "cache_kind", "k"))
def _stream_step_group(params, frames_u8, buffers, ctx_idx,
                       cfg: ModelConfig, net_hw, out_hw, dtype, attn_impl,
                       cache_kind, k: int):
    """k causal steps in ONE dispatch: batch what causality allows.

    Frame j+1's temporal attention reads frame j's cache row, so the steps
    cannot simply be batched — but the dependency flows ONLY through the
    cache.  Three phases, all in one executable:

      1. encoder over all k frames in one batch (per-frame ViT; batch-1 is
         MXU-starved at 1370 tokens),
      2. the cache-coupled head stage per frame in order
         (models/dpt.dpt_head_temporal_stage: tap projections, the four
         TemporalModules, refinenets 4/3 — all at <= 74x74, the cheap part),
      3. ONE batched output tail for all k frames
         (dpt_head_temporal_tail: refinenets 2/1 + output convs at
         148²..518², ~2/3 of the head's cost, where batch-1 wastes the chip).

    DEFERRED WRITES: the buffers are never written in-graph.  Each in-group
    frame's context is assembled as TWO contractions — a (31, _ONE_HOT)
    one-hot over the buffer rows (zero rows at positions that refer to ids
    written earlier IN this group) plus a tiny (31, j) one-hot over the held
    new rows of frames 0..j-1 — so the cross-frame dependency flows through
    live values instead of buffer writes.  The k new rows are returned
    stacked (leaves (BHW, k, C)) and committed by ``_write_step``.
    MEASURED (r3, one v5e): the deferral moved group-4 only 23.6 -> 23.3
    ms/frame — the in-graph writes were NOT paying the isolated-harness
    copy; the remaining gap to sequential submits (19.4) is the serialized
    batch-1 head stage.  Kept for the cleaner dataflow and the removed
    donate-then-reuse hazard.  The cache contents (and so every later
    frame) remain bit-identical to k individual ``submit`` calls; the k
    depths agree to reduction-order noise only (~1 bf16 ulp; rel <1e-5
    under fp32) because the encoder and the output tail run batched.
    Latency (up to k frames of buffering) trades for throughput.

    ctx_idx: (sel_buf (k, 31, _ONE_HOT) float, seljs — tuple of k (31, j)
    float arrays).
    """
    from vda_tpu.models.dpt import (
        dpt_head_temporal_stage,
        dpt_head_temporal_tail,
    )
    from vda_tpu.ops.resize import resize_bilinear

    x = preprocess_frames(frames_u8, net_hw, dtype=dtype)[None]  # (1,k,h,w,3)
    feats = forward_features(params, x, cfg, attn_impl)  # taps (k, N, D)
    nh, nw = x.shape[2], x.shape[3]
    patch_hw = (nh // cfg.vit.patch_size, nw // cfg.vit.patch_size)

    sel_buf, seljs = ctx_idx
    stage_outs, stage_caches = [], []
    for j in range(k):
        feats_j = [(t[j:j + 1], None if c is None else c[j:j + 1])
                   for t, c in feats]
        sb = sel_buf[j].astype(dtype)
        sj = seljs[j].astype(dtype)
        n_prev = sj.shape[1]

        def ctx(buf, *rows, sb=sb, sj=sj, n_prev=n_prev):
            c = jnp.einsum("rt,btc->brc", sb,
                           buf[:, :_ONE_HOT].astype(dtype))
            if n_prev:
                # held rows are unpadded (BHW, 1, C); c carries the
                # buffers' padded BHW — inject into the live rows only
                pr = jnp.concatenate(
                    [r.astype(dtype) for r in rows], axis=1)
                inj = jnp.einsum("rj,bjc->brc", sj, pr)
                c = c.at[:pr.shape[0]].add(inj)
            return c

        cache_list = jax.tree_util.tree_map(ctx, buffers, *stage_caches)
        stage_out, new_caches = dpt_head_temporal_stage(
            params["head"], feats_j, patch_hw, 1, cfg,
            cached_hidden_state_list=cache_list, cache_kind=cache_kind)
        stage_outs.append(stage_out)
        stage_caches.append(list(new_caches))

    batched = tuple(jnp.concatenate([s[i] for s in stage_outs])
                    for i in range(3))
    depth = dpt_head_temporal_tail(params["head"], batched, patch_hw,
                                   micro_batch_size=k)      # (k, nh', nw', 1)
    depth = resize_bilinear(depth, (nh, nw), align_corners=True)
    depth = jax.nn.relu(depth)
    depths = resize_bilinear(depth.astype(jnp.float32), out_hw,
                             align_corners=True)[..., 0]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=1), *stage_caches)
    return depths, stacked


def _advance_bookkeeping(step_id: int, order: List[int], free: List[int]):
    """ONE step of the cache bookkeeping, mutating ``order``.

    ``order`` holds LOGICAL frame ids (the reference's frame_cache_list
    mirror); physical rows derive deterministically via ``_row``.  ``free``
    is vestigial (kept for signature stability; always empty since the r3
    ring-deterministic placement).

    Returns (ctx_ids, new_id) for the step numbered ``step_id`` (0-based
    frame id; the first call after init is id 1).  This is the single source
    of truth for the reference's frame_cache_list protocol
    (video_depth_stream.py:134-160): context = entries [0:2] + the most
    recent INFER_LEN-3, the new entry is appended, and entry 1 is evicted
    once the window has slid past STREAM_GAP.  Both ``submit``/``_slide``
    and the ``submit_group`` simulation call this — they cannot drift apart.
    """
    ctx = order[0:2] + order[-(INFER_LEN - 3):]
    assert len(ctx) == _CTX
    order.append(step_id)
    _evict(step_id, order, free)
    # ring-placement safety: distinct live ids must occupy distinct rows —
    # i.e. the row just (re)used belonged to an already-evicted entry.  With
    # _RING = 44 and the protocol's 42-entry window this always holds; the
    # O(43) host check turns any future protocol change that breaks it into
    # a loud failure instead of silent cache corruption.
    live = set(order)
    assert len({_row(i) for i in live}) == len(live), \
        "ring placement collision: a live cache entry was overwritten"
    return ctx, step_id


def _evict(step_id: int, order: List[int], free: List[int]):
    """Eviction rule (reference video_depth_stream.py:155-160).  ``free`` is
    vestigial (rows derive from ids via ``_row`` since r3)."""
    if step_id + INFER_LEN > STREAM_GAP + 1:
        order.pop(1)


class StreamingDepth:
    """Stateful frame-by-frame depth estimator (reference
    video_depth_stream.py:32-161 ``infer_video_depth_one``)."""

    def __new__(cls, params, cfg: ModelConfig, input_size: int = 518,
                fp32: bool = False, attn_impl: str = "auto",
                cache_kind: str = "kv", ring: Optional[bool] = None,
                cache_dtype: Optional[str] = None, mesh=None,
                ctx_kernel: Optional[bool] = None):
        # the experimental flavors (mirrored-ring slice reads, fused in-place
        # Pallas buffer attention) are measured net losses on this hardware
        # and live in their own module; requesting them transparently
        # constructs the subclass so the opt-in API/env surface is unchanged
        ring_on = (os.environ.get("VDA_STREAM_RING", "0") == "1"
                   if ring is None else ring)
        direct_on = os.environ.get("VDA_STREAM_DIRECT", "0") == "1"
        slide_on = os.environ.get("VDA_STREAM_SLIDE", "0") == "1"
        if cls is StreamingDepth and (ring_on or direct_on or slide_on):
            from vda_tpu.infer.streaming_experimental import (
                ExperimentalStreamingDepth,
                SlidingStreamingDepth,
            )
            return super().__new__(
                SlidingStreamingDepth if slide_on and not (ring_on or
                                                           direct_on)
                else ExperimentalStreamingDepth)
        return super().__new__(cls)

    def __init__(self, params, cfg: ModelConfig, input_size: int = 518,
                 fp32: bool = False, attn_impl: str = "auto",
                 cache_kind: str = "kv", ring: Optional[bool] = None,
                 cache_dtype: Optional[str] = None, mesh=None,
                 ctx_kernel: Optional[bool] = None):
        """cache_kind: "kv" (default) caches pre-PE K/V projections and skips
        re-projecting the 31 context frames every step (~0.6 TFLOP/step at
        vitl, see models/temporal._temporal_attention_kv); "h" caches pre-PE
        hidden states exactly like the reference (video_depth_stream.py:
        134-140).  Outputs agree to ~1 bf16 ulp (tests/test_streaming_kv.py).

        ring: opt-in mirrored ring-buffer layout (streaming_experimental) —
        bit-exact, but a MEASURED net loss on-chip, so the default
        (None -> VDA_STREAM_RING env, else off) stays one-hot.

        mesh: a ('data','model') jax Mesh with model axis > 1 runs the
        stream TENSOR-PARALLEL (see the comment in __init__); the depth
        handles come back replicated.  Single-chip when None (default).

        cache_dtype: "bf16" (lossless) or "int8" — per-row symmetric
        quantization of the cache rows (``_write_step_q8``), halving the
        cache footprint and the per-step HBM read of the context assembly.
        The attention itself stays bf16 (rows are dequantized by the
        assembly); the only error is 8-bit rounding of the cached
        activations (worst case amax/254 per element).  Mutually exclusive
        with ``ring`` and the direct kernel; ``submit_group`` falls back to
        sequential submits.  None (default) resolves via
        ``_resolve_cache_dtype``: VDA_STREAM_CACHE_DTYPE env, else
        ``_DEFAULT_CACHE_DTYPE`` (see the r5 promotion note there).

        ctx_kernel: fused Pallas attention over the assembled KV context
        (models/temporal._temporal_attention_kv_ctx) — PE add, softmax and
        value contraction in one VMEM pass over the (BHW, 31, C) context
        instead of XLA's concat/PE-add/attention round trips.  Requires
        cache_kind="kv", no TP mesh (Pallas is single-chip) and
        attn_impl != "xla".  None (default) resolves the
        VDA_STREAM_CTX_KERNEL env (off otherwise).
        """
        cache_dtype = _resolve_cache_dtype(
            cache_dtype, experimental=type(self) is not StreamingDepth)
        if cache_dtype not in ("bf16", "int8"):
            raise ValueError(f"cache_dtype must be bf16 or int8, "
                             f"got {cache_dtype!r}")
        # mesh with a model axis > 1: TENSOR-PARALLEL streaming for latency —
        # the batch-1 encoder (7.5-9 ms/frame at vitl, MXU-starved) and the
        # cached head spread over tp chips.  Params go to the head-aligned TP
        # layout + Megatron shardings (parallel/mesh, same recipe as the
        # trainer and windowed driver); the kv cache buffers are sharded over
        # their channel dim (whole temporal-attention heads per chip, so the
        # context assembly and attention never reshard).  Pallas kernels are
        # single-chip programs, so attention falls back to XLA.
        self.mesh = None
        if mesh is not None:
            from vda_tpu.parallel.mesh import (
                MODEL_AXIS,
                param_shardings,
                to_tp_layout,
            )

            if dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
                if type(self) is not StreamingDepth:
                    raise ValueError("experimental streaming flavors do not "
                                     "support tensor parallelism")
                params = to_tp_layout(params)
                cfg = cfg.replace(tp_layout=True)
                attn_impl = "xla"
                params = jax.device_put(params, param_shardings(params, mesh))
                self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.input_size = input_size
        self.dtype = jnp.float32 if fp32 else jnp.bfloat16
        self.attn_impl = attn_impl
        self.cache_kind = cache_kind
        self.cache_dtype = cache_dtype
        self.ring = (os.environ.get("VDA_STREAM_RING", "0") == "1"
                     if ring is None else ring)
        if cache_dtype == "int8" and self.ring:
            raise ValueError("cache_dtype='int8' does not support the ring "
                             "layout (a measured dead end anyway)")
        unsupported = (cache_kind != "kv" or self.ring
                       or self.mesh is not None or self.attn_impl == "xla")
        if ctx_kernel is None:
            # env opt-in quietly yields where the kernel can't apply (e.g.
            # a TP mesh forces attn_impl="xla"); only an EXPLICIT True raises
            ctx_kernel = (os.environ.get("VDA_STREAM_CTX_KERNEL", "0") == "1"
                          and type(self) is StreamingDepth
                          and not unsupported)
        if ctx_kernel and unsupported:
            raise ValueError("ctx_kernel requires cache_kind='kv', no ring "
                             "layout, no TP mesh, and a non-xla attn_impl")
        self.ctx_kernel = bool(ctx_kernel)
        self.rows = self._buf_rows()
        self.reset()

    def _buf_rows(self) -> int:
        """Physical rows per cache buffer (the experimental ring layout
        appends mirror rows)."""
        return _BUF_ROWS

    def _row_of(self, entry_id: int) -> int:
        """Physical buffer row of a logical cache entry (layout hook: the
        experimental sliding layout maps ids to append-cursor positions)."""
        return _row(entry_id)

    def _sel_rows(self) -> int:
        """One-hot selection width of ``_stream_step`` (== rows the one-hot
        contraction reads per buffer)."""
        return _ONE_HOT

    def _mesh_scope(self):
        """Context manager making self.mesh the ambient mesh for dispatches
        (no-op single-chip)."""
        import contextlib

        return (jax.set_mesh(self.mesh) if self.mesh is not None
                else contextlib.nullcontext())

    def _shard_cache(self, buffers):
        """Pin the cache buffers' sharding under tensor parallelism.

        kv-mode rows are (BHW_pad, rows, C) with C = heads x head_dim of the
        temporal attention: sharding the channel dim puts whole heads per
        chip, so the one-hot context assembly and the attention read only
        local shards (the same head alignment as the weight shardings).
        h-mode rows are pre-projection hidden states — a CONTRACTION input
        of the sharded K/V projections — and stay replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vda_tpu.parallel.mesh import MODEL_AXIS

        tp = dict(self.mesh.shape)[MODEL_AXIS]
        heads = self.cfg.num_attention_heads

        def shard(b):
            if (self.cache_kind == "kv" and heads % tp == 0
                    and b.shape[-1] % tp == 0):
                return jax.device_put(
                    b, NamedSharding(self.mesh, P(None, None, MODEL_AXIS)))
            return jax.device_put(b, NamedSharding(self.mesh, P()))

        return jax.tree_util.tree_map(shard, buffers)

    def reset(self):
        self.id = -1
        self.net_hw: Optional[tuple] = None
        self.out_hw: Optional[tuple] = None
        self.buffers: Optional[List[jnp.ndarray]] = None
        self.scales = None  # int8 cache only: per-row dequant scales pytree
        # host-side mirror of the reference's frame_cache_list bookkeeping:
        # LOGICAL frame id of each live cache entry, in window order (the
        # physical buffer row derives deterministically via _row)
        self.order: List[int] = []
        self.free: List[int] = []  # vestigial since the ring placement (r3)

    def __call__(self, frame: np.ndarray) -> np.ndarray:
        """frame: (H, W, 3) uint8 RGB -> depth (H, W) fp32 (synchronous)."""
        return np.asarray(self.submit(frame))

    def submit(self, frame: np.ndarray) -> jax.Array:
        """Asynchronous step: enqueue one frame, return the depth as a DEVICE
        array (fp32, (H, W)) without blocking.

        JAX dispatch is async, so callers can overlap the device compute of
        frame n+1 with fetching frame n's depth (``np.asarray(handle)``) —
        under the tunneled chip this hides the ~10 ms dispatch + transfer
        round-trip per frame.  The cache buffers are donated and never leave
        the device either way.
        """
        step_id = self.id + 1  # committed with order/free after dispatch
        if self.net_hw is None:
            h, w = frame.shape[:2]
            size = effective_input_size(h, w, self.input_size)
            net_hw = compute_resize_hw(h, w, size)  # committed after dispatch:
            out_hw = (h, w)   # a failed FIRST dispatch must leave net_hw None
            with self._mesh_scope():
                depth, first_rows = _first_step(  # a retry redoes this branch
                    self.params, jnp.asarray(frame), self.cfg, net_hw,
                    out_hw, self.dtype, self.attn_impl, self.cache_kind)

            # replication trick (reference :118): the first frame's cache is
            # stored once; the first INFER_LEN logical entries all map to row 0
            if self.cache_dtype == "int8":
                def make_buf(row):
                    return jnp.zeros((_pad_rows(row.shape[0]), self.rows,
                                      row.shape[1]), jnp.int8)

                def make_sc(row):
                    return jnp.zeros((self.rows,), jnp.float32)

                with self._mesh_scope():
                    self.buffers, self.scales = _write_step_q8(
                        jax.tree_util.tree_map(make_buf, first_rows),
                        jax.tree_util.tree_map(make_sc, first_rows),
                        jax.tree_util.tree_map(lambda r: r[:, None],
                                               first_rows),
                        jnp.asarray([0], jnp.int32))
            else:
                def make_buf(row):
                    return (jnp.zeros((_pad_rows(row.shape[0]), self.rows,
                                       row.shape[1]), row.dtype)
                            .at[:row.shape[0], 0].set(row))

                with self._mesh_scope():
                    self.buffers = jax.tree_util.tree_map(make_buf,
                                                          first_rows)
            if self.mesh is not None:
                self.buffers = self._shard_cache(self.buffers)
            self.net_hw, self.out_hw = net_hw, out_hw
            self.id = step_id
            self.order = [0] * INFER_LEN
            self.free = []
            self._slide()
            return depth

        assert frame.shape[:2] == self.out_hw, "frame size changed mid-stream"
        # bookkeeping on COPIES, committed only after the dispatch succeeds —
        # a failed trace/compile must not advance order/free past the buffers
        order, free = list(self.order), list(self.free)
        ctx, new_id = _advance_bookkeeping(step_id, order, free)
        write_pos = self._row_of(new_id)
        depth, new_caches = self._step(frame, ctx,
                                       [self._row_of(i) for i in ctx])
        # commit the new rows in a SECOND, write-only dispatch: in-place
        # under any layout and overlapped with the next step (_write_step)
        self._commit(new_caches, write_pos)
        self.id, self.order, self.free = step_id, order, free
        return depth

    def _step(self, frame, ctx: List[int], ctx_rows: List[int]):
        """One step's model dispatch: (depth, new cache rows).  The
        experimental subclass overrides this to try its flavors first."""
        with self._mesh_scope():
            return _stream_step(
                self.params, jnp.asarray(frame), self.buffers,
                self.scales if self.cache_dtype == "int8" else None,
                jnp.asarray(ctx_rows, jnp.int32), self.cfg, self.net_hw,
                self.out_hw, self.dtype, self.attn_impl, self.cache_kind,
                sel_rows=self._sel_rows(), ctx_kernel=self.ctx_kernel)

    def _commit(self, new_caches, write_pos: int):
        """Commit the returned cache rows (write-only donated dispatch)."""
        wp = jnp.asarray([write_pos], jnp.int32)
        with self._mesh_scope():
            if self.cache_dtype == "int8":
                self.buffers, self.scales = _write_step_q8(
                    self.buffers, self.scales, new_caches, wp)
            else:
                self.buffers = _write_step(self.buffers, new_caches, wp,
                                           None)

    def _simulate_group(self, k: int):
        """Replay k steps of bookkeeping on COPIES (committed by the caller
        only after the dispatch succeeds — a failed compile/trace must not
        leave the stream with advanced order/free but unwritten buffers)."""
        sim_id, order, free = self.id, list(self.order), list(self.free)
        ctx_ids, ctx_rows, write_rows, group_ids = [], [], [], []
        for _ in range(k):
            sim_id += 1
            ctx, new_id = _advance_bookkeeping(sim_id, order, free)
            ctx_ids.append(list(ctx))
            ctx_rows.append([self._row_of(i) for i in ctx])
            write_rows.append(self._row_of(new_id))
            group_ids.append(new_id)
        return sim_id, order, free, ctx_ids, ctx_rows, write_rows, group_ids

    @staticmethod
    def _group_selectors(k, ctx_ids, ctx_rows, group_ids):
        """Deferred-write context selectors: split each frame's context into
        a buffer one-hot (zeroed at in-group positions) + a tiny one-hot over
        the earlier in-group frames' held rows."""
        pos_of = {gid: i for i, gid in enumerate(group_ids)}
        sel_buf = np.zeros((k, _CTX, _ONE_HOT), np.float32)
        seljs = []
        for j in range(k):
            selj = np.zeros((_CTX, j), np.float32)
            for p, (cid, crow) in enumerate(zip(ctx_ids[j], ctx_rows[j])):
                i = pos_of.get(cid)
                if i is not None and i < j:
                    selj[p, i] = 1.0
                else:
                    sel_buf[j, p, crow] = 1.0
            seljs.append(selj)
        return sel_buf, seljs

    def submit_group(self, frames: "np.ndarray") -> jax.Array:
        """Throughput mode: process k frames in ONE dispatch.

        frames: (k, H, W, 3) uint8.  Returns depths (k, H, W) fp32 as a
        device array.  The per-frame context/eviction bookkeeping is
        replayed exactly and the cache-coupled head stage runs sequentially
        in-graph, so the CACHE STATE (and every subsequent frame) is
        bit-identical to k ``submit`` calls; the k depths agree to
        reduction-order noise (~1 bf16 ulp, rel <1e-5 under fp32) because
        the encoder and the output tail run batched over the k frames
        (``_stream_step_group``).  The win is one dispatch instead of k,
        plus MXU-efficient batching of the two per-frame-independent phases.
        The tradeoff is latency: the first frame's depth arrives only after
        all k are captured.

        MEASURED (r2/r3, one v5e): ON-DEVICE per-frame cost is
        ~NEUTRAL-to-negative vs sequential submits (23.3 group-4 vs 19.4
        sequential e2e after the r3 deferred-write restructure; deferring
        the k buffer writes out of the program moved only ~0.3 ms/frame —
        the gap is the serialized batch-1 head stage, which the batched
        encoder/tail win does not cover).  Group mode pays only when
        per-call DISPATCH dominates (it collapses k dispatch round-trips
        into one): through the dev tunnel's ~10 ms/call it wins clearly; on
        directly-attached hardware prefer plain ``submit`` until a profile
        says otherwise.

        The stream must be initialized first (call ``submit`` once for the
        anchor frame, reference video_depth_stream.py:104-121).
        """
        if self.net_hw is None:
            raise RuntimeError(
                "initialize the stream with submit(first_frame) before "
                "submit_group")
        k = len(frames)
        assert frames.shape[1:3] == self.out_hw, "frame size changed mid-stream"
        if self.cache_dtype == "int8" or self.ctx_kernel:
            # the grouped program has no int8 dequant / fused-ctx-attention
            # path — sequential submits preserve the protocol exactly
            # (documented limitation)
            return jnp.stack([self.submit(f) for f in frames])
        (sim_id, order, free, ctx_ids, ctx_rows, write_rows,
         group_ids) = self._simulate_group(k)
        sel_buf, seljs = self._group_selectors(k, ctx_ids, ctx_rows,
                                               group_ids)
        with self._mesh_scope():
            depths, new_rows = _stream_step_group(
                self.params, jnp.asarray(frames), self.buffers,
                (jnp.asarray(sel_buf), tuple(jnp.asarray(s) for s in seljs)),
                self.cfg, self.net_hw, self.out_hw, self.dtype,
                self.attn_impl, self.cache_kind, k)
            self.buffers = _write_step(self.buffers, new_rows,
                                       jnp.asarray(write_rows, jnp.int32),
                                       None)
        self.id, self.order, self.free = sim_id, order, free
        return depths

    def _slide(self):
        """Eviction after the first-frame init (shared rule: ``_evict``)."""
        _evict(self.id, self.order, self.free)
