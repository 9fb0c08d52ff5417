"""int8 streaming cache (StreamingDepth(cache_dtype="int8")).

The cache rows are stored with per-row symmetric 8-bit quantization
(_write_step_q8) and dequantized by the context assembly — attention math
stays bf16, so the only deviation from the bf16 cache is the 8-bit rounding
of the cached K/V projections.  These tests pin the mechanism (protocol
identical, buffers int8, scales live) and bound the depth deviation.

The motion modules' proj_out is ZERO-initialized (reference
motion_module.py:57-58) so random-init depth comparisons need a perturbed
proj_out for the temporal context to reach the output at all.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vda_tpu.infer.streaming as S
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
    frames = (rng.random((49, 70, 90, 3)) * 255).astype(np.uint8)
    return cfg, params, frames


def test_int8_cache_tracks_bf16(tiny):
    cfg, params, frames = tiny

    ref = StreamingDepth(params, cfg, input_size=56)
    base = np.stack([np.asarray(ref.submit(f)) for f in frames])

    q = StreamingDepth(params, cfg, input_size=56, cache_dtype="int8")
    out = np.stack([np.asarray(q.submit(f)) for f in frames])

    # protocol bookkeeping identical
    assert q.order == ref.order
    # buffers really are int8 + live scales
    for b in jax.tree_util.tree_leaves(q.buffers):
        assert b.dtype == jnp.int8
    assert q.scales is not None
    scs = jax.tree_util.tree_leaves(q.scales)
    assert all(s.dtype == jnp.float32 for s in scs)
    assert any(float(np.asarray(s).max()) > 0 for s in scs)

    # depth deviation bounded by 8-bit rounding of the cached activations:
    # the first frame (no temporal context read) must agree to bf16 noise,
    # later frames within a loose quantization bound
    denom = np.maximum(np.abs(base), 1e-3)
    rel = np.abs(out - base) / denom
    assert float(rel[0].max()) < 2e-2
    assert float(np.median(rel)) < 5e-2
    # the streams must not diverge over time (error stays bounded, ~same
    # magnitude in the last third as overall)
    assert float(np.median(rel[-16:])) < 1e-1


def test_int8_rejects_ring_and_bad_dtype(tiny):
    cfg, params, _ = tiny
    with pytest.raises(ValueError):
        StreamingDepth(params, cfg, input_size=56, cache_dtype="int8",
                       ring=True)
    with pytest.raises(ValueError):
        StreamingDepth(params, cfg, input_size=56, cache_dtype="fp8")


def test_int8_group_falls_back_to_sequential(tiny):
    cfg, params, frames = tiny

    seq = StreamingDepth(params, cfg, input_size=56, cache_dtype="int8")
    outs = [np.asarray(seq.submit(f)) for f in frames[:9]]

    g = StreamingDepth(params, cfg, input_size=56, cache_dtype="int8")
    gouts = [np.asarray(g.submit(frames[0]))]
    for i in range(1, 9, 4):
        got = g.submit_group(frames[i:i + 4])
        gouts.extend(np.asarray(d) for d in got)

    # the fallback IS sequential submits: bit-exact
    assert np.array_equal(np.stack(outs), np.stack(gouts))
    assert g.order == seq.order


def test_write_step_q8_roundtrip():
    """Quantize->dequantize of one row through the real write/read path is
    within amax/127 per element (symmetric per-row scaling)."""
    rng = np.random.default_rng(1)
    row = jnp.asarray(rng.standard_normal((20, 1, 8)), jnp.float32)
    buf = jnp.zeros((24, 5, 8), jnp.int8)
    sc = jnp.zeros((5,), jnp.float32)
    (buf2,), (sc2,) = S._write_step_q8([buf], [sc], [row],
                                       jnp.asarray([3], jnp.int32))
    deq = np.asarray(buf2[:20, 3], np.float32) * float(sc2[3])
    err = np.abs(deq - np.asarray(row[:, 0]))
    assert float(err.max()) <= float(np.abs(row).max()) / 127.0 + 1e-6
