"""Direct-buffer streaming attention vs the assembly path.

The steady-state streaming step (infer/streaming._stream_step_direct +
ops/pallas_stream) attends straight over the 43-row ring buffers with a
position-map/mask instead of materializing the 31-entry context.  It must
reproduce the assembly path (_stream_step) to reduction-order noise.

The motion modules' proj_out is ZERO-initialized (reference
motion_module.py:57-58), so with random init the temporal attention output
is multiplied by zero and depth comparisons have no power — these tests
perturb proj_out so attention differences reach the depth.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _direct_on(monkeypatch):
    # the direct path is opt-in (measured net loss on-chip): the env is
    # snapshotted at CONSTRUCTION by StreamingDepth.__new__ (flavor subclass
    # selection) and re-checked per-submit by ExperimentalStreamingDepth.
    # _direct_ok, so it must be set before StreamingDepth(...) is built.
    # monkeypatch scopes the flag to THIS module's tests — a module-level
    # os.environ write would leak into every later test and silently move
    # the other streaming tests off the production-default assembly path.
    monkeypatch.setenv("VDA_STREAM_DIRECT", "1")


from vda_tpu.config import get_config
from vda_tpu.infer import StreamingDepth
from vda_tpu.models import init_video_depth_anything


@pytest.fixture(scope="module")
def tiny():
    cfg = get_config("tiny")
    params = init_video_depth_anything(jax.random.PRNGKey(3), cfg)
    # make temporal attention reach the output (see module docstring)
    for i, mm in enumerate(params["head"]["motion_modules"]):
        k = jax.random.PRNGKey(100 + i)
        mm["proj_out"]["w"] = 0.05 * jax.random.normal(
            k, mm["proj_out"]["w"].shape, mm["proj_out"]["w"].dtype)
    rng = np.random.default_rng(0)
    frames = (rng.random((50, 70, 90, 3)) * 255).astype(np.uint8)
    return cfg, params, frames


def _run(stream, frames):
    return np.stack([np.asarray(stream.submit(f)) for f in frames])


def test_direct_crosses_over_and_matches_assembly(tiny):
    cfg, params, frames = tiny
    sa = StreamingDepth(params, cfg, input_size=56)
    sa._direct_ok = lambda *a: False  # force assembly everywhere
    ref = _run(sa, frames)

    sd = StreamingDepth(params, cfg, input_size=56)
    # the direct path must engage once the warmup anchor replication drains
    engaged = []
    out = [np.asarray(sd.submit(frames[0]))]
    for f in frames[1:]:
        import vda_tpu.infer.streaming as S
        order, free = list(sd.order), list(sd.free)
        ctx, _ = S._advance_bookkeeping(sd.id + 1, order, free)
        engaged.append(sd._direct_ok([S._row(i) for i in ctx]))
        out.append(np.asarray(sd.submit(f)))
    assert not engaged[0] and engaged[-1], engaged
    out = np.stack(out)

    scale = max(np.abs(ref).max(), 1e-6)
    err = np.abs(ref - out).max() / scale
    # bf16: exp-in-bf16 + deferred normalization vs fp32 softmax — a couple
    # of ulp through the depth head
    assert err < 5e-2, f"rel err {err:.2e}"
    # pre-PE cache rows are computed from the same hidden states; block-2
    # slots inherit ~1 ulp from the block-1 attention recipe difference
    for b1, b2 in zip(jax.tree_util.tree_leaves(sa.buffers),
                      jax.tree_util.tree_leaves(sd.buffers)):
        a, b = np.asarray(b1, np.float32), np.asarray(b2, np.float32)
        s = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / s < 5e-2


def test_direct_fp32_tight(tiny):
    cfg, params, frames = tiny
    sa = StreamingDepth(params, cfg, input_size=56, fp32=True)
    sa._direct_ok = lambda *a: False
    ref = _run(sa, frames[:46])
    sd = StreamingDepth(params, cfg, input_size=56, fp32=True)
    out = _run(sd, frames[:46])
    scale = max(np.abs(ref).max(), 1e-6)
    err = np.abs(ref - out).max() / scale
    # fp32: only reduction-order / deferred-normalization noise remains
    assert err < 1e-4, f"rel err {err:.2e}"


def test_group_direct_matches_sequential_direct(tiny):
    cfg, params, frames = tiny
    seq = StreamingDepth(params, cfg, input_size=56)
    ref = _run(seq, frames)

    grp = StreamingDepth(params, cfg, input_size=56)
    out = [np.asarray(grp.submit(frames[0]))]
    i = 1
    while i < len(frames):
        k = min(4, len(frames) - i)
        out.extend(np.asarray(grp.submit_group(frames[i:i + k])))
        i += k
    out = np.stack(out)
    assert grp.order == seq.order and grp.free == seq.free
    scale = max(np.abs(ref).max(), 1e-6)
    err = np.abs(ref - out).max() / scale
    # groups crossing the warmup/steady boundary fall back to assembly for
    # the whole group; later groups run direct — both match sequential to
    # reduction-order noise
    assert err < 5e-2, f"rel err {err:.2e}"
    for b1, b2 in zip(jax.tree_util.tree_leaves(seq.buffers),
                      jax.tree_util.tree_leaves(grp.buffers)):
        a, b = np.asarray(b1, np.float32), np.asarray(b2, np.float32)
        s = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / s < 5e-2
