"""MEASURED-DEAD-END streaming step flavors, quarantined from the default.

Both flavors here are bit-exact alternatives to the default one-hot context
assembly (vda_tpu/infer/streaming.py) that LOST their on-chip A/Bs on the
v5e this framework targets.  They are kept — behind this module and the
opt-in switches — because their measured ledgers are load-bearing design
documentation and because a future toolchain (in-place XLA updates, a better
Mosaic scheduler) could flip either verdict:

  * ``_stream_step_ring`` (StreamingDepth(ring=True) / VDA_STREAM_RING=1):
    mirror rows 45..72 make the 29 recent entries one contiguous window,
    read with three static-size dynamic slices.  Wins ~2.8 ms on the read at
    equal layout but pays ~6 ms for the layout (bigger buffers + dual
    write).  r3 same-session ladder (vitl 518², ms/frame): 19.22 one-hot/
    45-row/single-write vs 21.20 (45 rows + idempotent dual write) vs 22.44
    (ring, 73 rows) vs 25.22 (one-hot over 73 rows); still 21.83 vs 19.36
    after the write-dispatch split.  NET LOSS in every regime.

  * ``_stream_step_direct`` (VDA_STREAM_DIRECT=1): temporal attention reads
    the ring buffers IN PLACE via a fused Pallas kernel (ops/pallas_stream)
    — selection, PE and softmax in one pass, no context materialization.
    Bit-exact vs the assembly path (max_rel 0.0 on-chip) and SLOWER: 25.2 vs
    21.05 ms/frame (r3) — in-kernel reads of all 44 buffer rows lose to the
    one-hot assembly.

``StreamingDepth.__new__`` transparently constructs the subclass below when
either opt-in is requested, so the public API surface is unchanged.
"""

from __future__ import annotations

import functools
import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from vda_tpu.config import INFER_LEN, ModelConfig
from vda_tpu.infer.streaming import (
    _BUF_ROWS,
    _CTX,
    _ONE_HOT,
    _RING,
    _to_out_depth,
    _write_row,
    _write_step,
    StreamingDepth,
)
from vda_tpu.models.vda import forward_depth, forward_features
from vda_tpu.utils.transform import preprocess_frames

_MIRROR = INFER_LEN - 4  # ring rows 1.._MIRROR get a +_RING twin
_BUF_ROWS_RING = _ONE_HOT + _MIRROR


def _mirror_row(p: int) -> int:
    """Second write position for ring row ``p`` (== p when no mirror)."""
    return p + _RING if 1 <= p <= _MIRROR else p


def _ring_ok(ctx: List[int]) -> bool:
    """True when the context can be read with the three-slice ring layout:
    entry 0 is the immortal anchor and the 29 recent entries are CONSECUTIVE
    ids >= 1 (their ring rows are then one contiguous row window).  False
    during warmup while replicated id-0 entries remain in the recent set."""
    recent = ctx[2:]
    return (ctx[0] == 0 and recent[0] >= 1
            and all(b - a == 1 for a, b in zip(recent, recent[1:])))


def _pos_map(ctx: List[int], rows: int = _BUF_ROWS):
    """Row -> logical-context-position table for the direct kernel.

    ctx: 31 DISTINCT buffer rows in context order; rows: the buffer's row
    count (layout-dependent).  Returns (pos_map (rows,) int32, valid (rows,)
    bool): pos_map[r] is the context position of row r (arbitrary where
    valid[r] is False)."""
    pos_map = np.zeros((rows,), np.int32)
    valid = np.zeros((rows,), np.bool_)
    for i, r in enumerate(ctx):
        pos_map[r] = i
        valid[r] = True
    return pos_map, valid


@functools.partial(jax.jit, static_argnames=("cfg", "net_hw", "out_hw", "dtype",
                                             "attn_impl", "cache_kind"))
def _stream_step_ring(params, frame_u8, buffers, a1_row, run_start,
                      cfg: ModelConfig, net_hw, out_hw, dtype,
                      attn_impl, cache_kind):
    """Steady-state step: the context is read with three static-size slices.

    Engages once the 29 most-recent context entries are CONSECUTIVE ids
    (every step after the warmup replication drains) — their ring rows are
    then one contiguous window [run_start, run_start+29) thanks to the
    mirror region, and the context becomes

        [row 0 (anchor), row a1_row (order[1]), window]

    reading exactly 31 rows per buffer instead of one-hot-contracting all
    _ONE_HOT rows (~0.4 GB/step less HBM read at vitl 518², plus no
    (31, rows) select matmul).  Identical math to ``_stream_step`` with the
    same ctx — concatenation of the same rows in the same order.  MEASURED
    NET LOSS on-chip; see the module docstring for the full ladder.
    """
    x = preprocess_frames(frame_u8[None], net_hw, dtype=dtype)[None]
    feats = forward_features(params, x, cfg, attn_impl)

    def ctx(buf):
        b = buf.astype(dtype)
        return jnp.concatenate([
            b[:, 0:1],
            jax.lax.dynamic_slice_in_dim(b, a1_row, 1, axis=1),
            jax.lax.dynamic_slice_in_dim(b, run_start, _CTX - 2, axis=1),
        ], axis=1)

    cache_list = jax.tree_util.tree_map(ctx, buffers)
    depth, new_caches = forward_depth(params, feats, x.shape, cfg,
                                      cached_hidden_state_list=cache_list,
                                      cache_kind=cache_kind)
    d = _to_out_depth(depth, out_hw)
    return d, list(new_caches)


@functools.partial(jax.jit, static_argnames=("cfg", "net_hw", "out_hw",
                                             "dtype", "attn_impl"))
def _stream_step_direct(params, frame_u8, buffers, pos_map, valid,
                        cfg: ModelConfig, net_hw, out_hw, dtype,
                        attn_impl):
    """Steady-state step: temporal attention reads the ring buffers in place.

    No context assembly: ``pos_map`` ((rows,) int32) gives each buffer
    row's logical context position and ``valid`` masks the 31 live rows; the
    fused kernel (ops/pallas_stream via models/temporal
    ``_temporal_attention_kv_direct``) applies selection, PE and softmax in
    one pass over the buffers.  Requires every context entry to be a distinct
    row (true once the anchor replication of the warmup has drained —
    ``ExperimentalStreamingDepth._step`` checks and falls back to the
    assembly).  MEASURED SLOWER than the assembly (module docstring).
    """
    x = preprocess_frames(frame_u8[None], net_hw, dtype=dtype)[None]
    feats = forward_features(params, x, cfg, attn_impl)
    cache_list = [(k, v, pos_map, valid) for k, v in buffers]
    depth, new_caches = forward_depth(params, feats, x.shape, cfg,
                                      cached_hidden_state_list=cache_list,
                                      cache_kind="kv")
    d = _to_out_depth(depth, out_hw)
    return d, list(new_caches)


@functools.partial(jax.jit, static_argnames=("cfg", "net_hw", "out_hw",
                                             "dtype", "attn_impl",
                                             "cache_kind", "k"),
                   donate_argnums=(2,))
def _stream_step_group_direct(params, frames_u8, buffers, ctx_idx, write_pos,
                              mirror_pos, cfg: ModelConfig, net_hw, out_hw,
                              dtype, attn_impl, cache_kind, k: int):
    """Direct-kernel group step: k causal steps in one dispatch with the
    Pallas attention reading the ring buffers in place, so the in-group
    writes must land in-graph and the buffers are DONATED (in-place update,
    no full copy).  Same three-phase structure as the default
    ``_stream_step_group`` (batched encoder, sequential cache-coupled head
    stage, batched output tail); ctx_idx is the ((k, rows) pos_map,
    (k, rows) valid) pair and the updated buffers are returned."""
    from vda_tpu.models.dpt import (
        dpt_head_temporal_stage,
        dpt_head_temporal_tail,
    )
    from vda_tpu.ops.resize import resize_bilinear

    x = preprocess_frames(frames_u8, net_hw, dtype=dtype)[None]  # (1,k,h,w,3)
    feats = forward_features(params, x, cfg, attn_impl)  # taps (k, N, D)
    nh, nw = x.shape[2], x.shape[3]
    patch_hw = (nh // cfg.vit.patch_size, nw // cfg.vit.patch_size)

    pos_map, valid = ctx_idx
    stage_outs = []
    for j in range(k):
        feats_j = [(t[j:j + 1], None if c is None else c[j:j + 1])
                   for t, c in feats]
        cache_list = [(kb, vb, pos_map[j], valid[j]) for kb, vb in buffers]
        stage_out, new_caches = dpt_head_temporal_stage(
            params["head"], feats_j, patch_hw, 1, cfg,
            cached_hidden_state_list=cache_list, cache_kind=cache_kind)
        stage_outs.append(stage_out)
        wp = write_pos[j]
        mp = None if mirror_pos is None else mirror_pos[j]
        buffers = jax.tree_util.tree_map(
            lambda buf, nc, wp=wp, mp=mp: _write_row(buf, nc, wp, mp),
            buffers, list(new_caches))

    batched = tuple(jnp.concatenate([s[i] for s in stage_outs])
                    for i in range(3))
    depth = dpt_head_temporal_tail(params["head"], batched, patch_hw,
                                   micro_batch_size=k)      # (k, nh', nw', 1)
    depth = resize_bilinear(depth, (nh, nw), align_corners=True)
    depth = jax.nn.relu(depth)
    depths = resize_bilinear(depth.astype(jnp.float32), out_hw,
                             align_corners=True)[..., 0]
    return depths, buffers


@functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
def _compact_step(buffers, src_start, n: int):
    """Sliding-layout compaction: move the n live non-anchor rows (always
    CONSECUTIVE, starting at ``src_start``) back to rows [1, 1+n).  One
    bounded read+write of ~n/rows of each buffer, amortized over the
    rows-43 steps between compactions (~0.04 ms/frame at rows=128)."""
    def c(buf):
        live = jax.lax.dynamic_slice_in_dim(buf, src_start, n, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(buf, live, 1, axis=1)

    return jax.tree_util.tree_map(c, buffers)


class SlidingStreamingDepth(StreamingDepth):
    """Append-only sliding cache layout: the three-slice context read on
    EVERY steady-state step, with none of the ring layout's tax.

    r4 design, motivated by the r3 ladder: the three-slice read beats the
    one-hot contraction by ~2.8 ms/frame AT EQUAL LAYOUT (it touches 31 rows
    instead of contracting all 45), but the mirrored-ring layout that made
    the recent-29 window contiguous cost more than the read saved (dual
    writes + bigger buffers).  This layout gets contiguity for free: new
    entries append at an increasing cursor (row = 1 + id - base), so the 29
    most-recent entries — consecutive ids in steady state — are ALWAYS one
    contiguous row window, with the same single-row write per step as the
    default.  When the cursor reaches the buffer end (every rows-43 steps) a
    bounded compaction dispatch (``_compact_step``) slides the ~41 live rows
    back to the front.  Steady-state math is identical to the default
    (same rows concatenated in the same order -> bit-exact); warmup (ids
    replicated by the reference's first-frame trick) falls back to the
    one-hot step widened to the full buffer.

    MEASURED NET LOSS on-chip (r4 interleaved A/B, vitl 518², one v5e;
    scripts/ab_stream_slide.py): p50 ms/frame default 20.45 vs slide 26.73
    at rows=128, and 20.57 vs 25.28 at rows=56 — bit-exact output (max-abs
    -diff 0.0) both times.  Only ~1.6 ms of the gap scales with buffer
    size; the remaining ~4.7 ms is the three-dynamic-slice read itself,
    which in the FULL program loses to the one-hot contraction it replaces
    (dynamic-start slices on 16 buffers defeat the fusion/prefetch the
    one-hot matmul form gets).  This also reframes the r3 ring ladder: the
    "slice read wins 2.8 ms at equal layout" comparison had BOTH arms on
    the degraded 73-row layout; against the production one-hot step the
    slice read was never ahead.  Stays opt-in via VDA_STREAM_SLIDE=1 as a
    measured result; buffer cost is rows/45 x the default cache (2.8x at
    the default 128 rows: ~3.6 GB at vitl 518²).  Excludes int8/ring/direct.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.cache_dtype != "bf16" or self.ring:
            raise ValueError("sliding layout supports only the bf16 cache "
                             "without ring/direct flavors")

    def _buf_rows(self) -> int:
        return max(int(os.environ.get("VDA_STREAM_SLIDE_ROWS", "128")),
                   _CTX + 16)

    def _sel_rows(self) -> int:
        return self.rows  # warmup one-hot must cover every append slot

    def _row_of(self, entry_id: int) -> int:
        return 0 if entry_id == 0 else 1 + (entry_id - self._base)

    def reset(self):
        super().reset()
        self._base = 1  # logical id living at row 1

    def submit(self, frame):
        if self.net_hw is not None:
            new_id = self.id + 1
            if self._row_of(new_id) >= self.rows:
                # live non-anchor ids are consecutive once warmup drained
                # (compaction can only trigger past id ~rows-1 >> warmup)
                assert all(b - a == 1 for a, b in
                           zip(self.order[1:], self.order[2:])), self.order
                n = len(self.order) - 1
                src = self._row_of(self.order[1])
                self.buffers = _compact_step(self.buffers, jnp.int32(src), n)
                self._base = self.order[1]
        return super().submit(frame)

    def _step(self, frame, ctx: List[int], ctx_rows: List[int]):
        if _ring_ok(ctx):
            # identical math to the one-hot step: the same 31 rows
            # concatenated in the same order (anchor, order[1], the
            # contiguous recent-29 window) — but reading exactly 31 rows
            return _stream_step_ring(
                self.params, jnp.asarray(frame), self.buffers,
                jnp.int32(ctx_rows[1]), jnp.int32(ctx_rows[2]), self.cfg,
                self.net_hw, self.out_hw, self.dtype, self.attn_impl,
                self.cache_kind)
        return StreamingDepth._step(self, frame, ctx, ctx_rows)

    def submit_group(self, frames: "np.ndarray") -> jax.Array:
        # group mode is a dispatch-latency tool (measured neutral-to-negative
        # on-device); the sliding experiment keeps it as sequential submits
        return jnp.stack([self.submit(f) for f in frames])


class ExperimentalStreamingDepth(StreamingDepth):
    """StreamingDepth with the quarantined flavors enabled.

    Constructed transparently by ``StreamingDepth.__new__`` when ring=True /
    VDA_STREAM_RING=1 / VDA_STREAM_DIRECT=1; behaves exactly like the
    default otherwise (the direct kernel additionally requires kv cache,
    APE, no TP layout, and a TPU/interpret backend — ``_direct_ok``)."""

    def _buf_rows(self) -> int:
        return _BUF_ROWS_RING if self.ring else _BUF_ROWS

    def _direct_ok(self, *ctxs) -> bool:
        """Steady-state in-place buffer attention is usable when every context
        entry is a DISTINCT buffer row (during warmup the anchor row fills
        multiple positions — the reference replication trick — which only the
        assembly path can express), the cache holds kv projections, PE is
        additive (APE), and the Pallas kernel can run."""
        from vda_tpu.models.temporal import _on_tpu_or_interpret

        if os.environ.get("VDA_STREAM_DIRECT", "0") != "1":
            return False
        return (self.cache_kind == "kv" and self.cfg.pe == "ape"
                and not self.cfg.tp_layout
                and all(len(set(c)) == len(c) for c in ctxs)
                and _on_tpu_or_interpret())

    def _step(self, frame, ctx: List[int], ctx_rows: List[int]):
        if self.cache_dtype == "bf16" and self._direct_ok(ctx_rows):
            pos_map, valid = _pos_map(ctx_rows, self.rows)
            return _stream_step_direct(
                self.params, jnp.asarray(frame), self.buffers,
                jnp.asarray(pos_map), jnp.asarray(valid), self.cfg,
                self.net_hw, self.out_hw, self.dtype, self.attn_impl)
        if self.cache_dtype == "bf16" and self.ring and _ring_ok(ctx):
            return _stream_step_ring(
                self.params, jnp.asarray(frame), self.buffers,
                jnp.int32(ctx_rows[1]), jnp.int32(ctx_rows[2]), self.cfg,
                self.net_hw, self.out_hw, self.dtype, self.attn_impl,
                self.cache_kind)
        return super()._step(frame, ctx, ctx_rows)

    def _commit(self, new_caches, write_pos: int):
        if self.ring and self.cache_dtype != "int8":
            self.buffers = _write_step(
                self.buffers, new_caches,
                jnp.asarray([write_pos], jnp.int32),
                jnp.asarray([_mirror_row(write_pos)], jnp.int32))
            return
        super()._commit(new_caches, write_pos)

    def submit_group(self, frames: "np.ndarray") -> jax.Array:
        """Group mode with the experimental flavors: direct kernel when
        usable for EVERY in-group context, else the default deferred-write
        one-hot mode (with mirror writes when the ring layout is on)."""
        if self.net_hw is None or self.cache_dtype == "int8":
            return super().submit_group(frames)
        k = len(frames)
        assert frames.shape[1:3] == self.out_hw, \
            "frame size changed mid-stream"
        (sim_id, order, free, ctx_ids, ctx_rows, write_rows,
         group_ids) = self._simulate_group(k)
        wp = jnp.asarray(write_rows, jnp.int32)
        mp = (jnp.asarray([_mirror_row(r) for r in write_rows], jnp.int32)
              if self.ring else None)
        if self._direct_ok(*ctx_rows):
            maps = [_pos_map(c, self.rows) for c in ctx_rows]
            sel = (jnp.asarray(np.stack([m for m, _ in maps])),
                   jnp.asarray(np.stack([v for _, v in maps])))
            depths, self.buffers = _stream_step_group_direct(
                self.params, jnp.asarray(frames), self.buffers, sel, wp, mp,
                self.cfg, self.net_hw, self.out_hw, self.dtype,
                self.attn_impl, self.cache_kind, k)
        else:
            from vda_tpu.infer.streaming import _stream_step_group

            sel_buf, seljs = self._group_selectors(k, ctx_ids, ctx_rows,
                                                   group_ids)
            depths, new_rows = _stream_step_group(
                self.params, jnp.asarray(frames), self.buffers,
                (jnp.asarray(sel_buf), tuple(jnp.asarray(s) for s in seljs)),
                self.cfg, self.net_hw, self.out_hw, self.dtype,
                self.attn_impl, self.cache_kind, k)
            self.buffers = _write_step(self.buffers, new_rows, wp, mp)
        self.id, self.order, self.free = sim_id, order, free
        return depths
