"""Ring-slice streaming context assembly vs the one-hot path.

The steady-state streaming step (infer/streaming_experimental._stream_step_ring) reads
the 31-entry context with three static-size dynamic slices — possible
because entry ids map to buffer rows deterministically (_row) and rows
45..72 mirror ring rows 1..28, so the 29 consecutive recent entries are one
contiguous row window.  It must reproduce the one-hot assembly path
(_stream_step) BIT-EXACTLY: a one-hot select matmul has exactly one nonzero
term per output row, so both paths concatenate the same rows in the same
order with no float reassociation.

The motion modules' proj_out is ZERO-initialized (reference
motion_module.py:57-58), so with random init the temporal attention output
is multiplied by zero and depth comparisons have no power — these tests
perturb proj_out so attention differences reach the depth.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vda_tpu.infer.streaming as S
import vda_tpu.infer.streaming_experimental as SE
from vda_tpu.config import get_config
from vda_tpu.infer import StreamingDepth
from vda_tpu.models import init_video_depth_anything


@pytest.fixture(scope="module")
def tiny():
    cfg = get_config("tiny")
    params = init_video_depth_anything(jax.random.PRNGKey(3), cfg)
    for i, mm in enumerate(params["head"]["motion_modules"]):
        k = jax.random.PRNGKey(100 + i)
        mm["proj_out"]["w"] = 0.05 * jax.random.normal(
            k, mm["proj_out"]["w"].shape, mm["proj_out"]["w"].dtype)
    rng = np.random.default_rng(0)
    frames = (rng.random((50, 70, 90, 3)) * 255).astype(np.uint8)
    return cfg, params, frames


def test_ring_engages_and_matches_onehot(tiny, monkeypatch):
    cfg, params, frames = tiny

    ref_stream = StreamingDepth(params, cfg, input_size=56, ring=True)
    calls = {"ring": 0}
    orig = SE._stream_step_ring

    def spy(*a, **kw):
        calls["ring"] += 1
        return orig(*a, **kw)

    with monkeypatch.context() as m:
        # force the one-hot path everywhere for the reference stream (same
        # ring buffer layout, so the cache buffers stay comparable)
        m.setattr(SE, "_ring_ok", lambda ctx: False)
        ref = np.stack([np.asarray(ref_stream.submit(f)) for f in frames])

    out_stream = StreamingDepth(params, cfg, input_size=56, ring=True)
    monkeypatch.setattr(SE, "_stream_step_ring", spy)
    out = np.stack([np.asarray(out_stream.submit(f)) for f in frames])

    # the ring path must engage once the warmup replication drains (~step 30)
    assert calls["ring"] >= 15, calls
    # identical rows concatenated in identical order -> bit-exact depths
    assert np.array_equal(ref, out)
    # the DEFAULT layout (45 rows, single write, one-hot) selects the same
    # rows in the same order -> also bit-exact across layouts
    base_stream = StreamingDepth(params, cfg, input_size=56, ring=False)
    assert base_stream.ring is False and base_stream.rows == S._BUF_ROWS
    base = np.stack([np.asarray(base_stream.submit(f)) for f in frames])
    assert np.array_equal(base, out)
    # and bit-exact cache buffers (including the mirror rows — the one-hot
    # flavor performs the same dual write)
    for b1, b2 in zip(jax.tree_util.tree_leaves(ref_stream.buffers),
                      jax.tree_util.tree_leaves(out_stream.buffers)):
        assert np.array_equal(np.asarray(b1, np.float32),
                              np.asarray(b2, np.float32))
    assert ref_stream.order == out_stream.order


def test_ring_placement_long_run_no_collision():
    """500 steps of the bookkeeping: the collision assert inside
    _advance_bookkeeping proves no live entry's row is ever overwritten, and
    the recent-29 window always fits the mirrored region."""
    from vda_tpu.config import INFER_LEN

    order, free = [0] * INFER_LEN, []
    S._evict(0, order, free)
    for step in range(1, 500):
        ctx, new_id = S._advance_bookkeeping(step, order, free)
        assert new_id == step
        if SE._ring_ok(ctx):
            start = S._row(ctx[2])
            assert 1 <= start <= S._RING
            assert start + (S._CTX - 2) - 1 < SE._BUF_ROWS_RING
            # the window rows must BE the recent entries' rows, in order
            rows = [S._row(i) for i in ctx[2:]]
            expect = [start + j for j in range(S._CTX - 2)]
            primary = [r if r < S._ONE_HOT else r - S._RING for r in expect]
            assert [S._row(i) for i in ctx[2:]] == rows
            assert [1 + (i - 1) % S._RING for i in ctx[2:]] == primary


def test_ring_write_positions_cover_mirror():
    """Every ring row 1..28 written by submit must also land in its mirror
    twin — _mirror_row is exercised across a full ring wrap."""
    seen = set()
    for entry_id in range(1, 120):
        p = S._row(entry_id)
        m = SE._mirror_row(p)
        if 1 <= p <= SE._MIRROR:
            assert m == p + S._RING
        else:
            assert m == p
        seen.add((p, m))
    assert len({p for p, _ in seen}) == S._RING
