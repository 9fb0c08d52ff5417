"""Sliding append-only cache layout vs the default one-hot path.

The r4 experimental layout (streaming_experimental.SlidingStreamingDepth)
appends cache rows at an increasing cursor so the steady-state context is
read with three static-size slices, and periodically compacts the live rows
back to the front.  Both the slice read and the compaction preserve rows
bitwise and concatenate the same rows in the same order as the default
one-hot assembly, so depths must match BIT-EXACTLY across the layouts.

The motion modules' proj_out is ZERO-initialized (reference
motion_module.py:57-58), so with random init the temporal attention output
is multiplied by zero and depth comparisons have no power — these tests
perturb proj_out so attention differences reach the depth.
"""

import numpy as np
import pytest

import jax

import vda_tpu.infer.streaming_experimental as SE
from vda_tpu.config import get_config
from vda_tpu.infer import StreamingDepth
from vda_tpu.models import init_video_depth_anything
from vda_tpu.infer.streaming_experimental import SlidingStreamingDepth


@pytest.fixture(scope="module")
def tiny():
    cfg = get_config("tiny")
    params = init_video_depth_anything(jax.random.PRNGKey(3), cfg)
    for i, mm in enumerate(params["head"]["motion_modules"]):
        k = jax.random.PRNGKey(100 + i)
        mm["proj_out"]["w"] = 0.05 * jax.random.normal(
            k, mm["proj_out"]["w"].shape, mm["proj_out"]["w"].dtype)
    rng = np.random.default_rng(0)
    frames = (rng.random((120, 70, 90, 3)) * 255).astype(np.uint8)
    return cfg, params, frames


def test_slide_matches_default_bitexact_across_compactions(tiny,
                                                           monkeypatch):
    cfg, params, frames = tiny
    # tiny buffer (48 rows) -> a compaction every 5 steps: the 120-frame run
    # crosses ~15 compactions plus the warmup one-hot fallback
    monkeypatch.setenv("VDA_STREAM_SLIDE_ROWS", "48")

    base = StreamingDepth(params, cfg, input_size=56)
    ref = np.stack([np.asarray(base.submit(f)) for f in frames])

    slide = SlidingStreamingDepth(params, cfg, input_size=56)
    assert type(slide) is SlidingStreamingDepth and slide.rows == 48
    calls = {"slice": 0, "compact": 0}
    orig_ring = SE._stream_step_ring
    orig_compact = SE._compact_step

    def spy_ring(*a, **kw):
        calls["slice"] += 1
        return orig_ring(*a, **kw)

    def spy_compact(*a, **kw):
        calls["compact"] += 1
        return orig_compact(*a, **kw)

    monkeypatch.setattr(SE, "_stream_step_ring", spy_ring)
    monkeypatch.setattr(SE, "_compact_step", spy_compact)
    out = np.stack([np.asarray(slide.submit(f)) for f in frames])

    assert calls["slice"] >= 60, calls   # slice path engaged post-warmup
    assert calls["compact"] >= 10, calls  # several full compaction cycles
    assert base.order == slide.order
    assert np.array_equal(ref, out)


def test_slide_env_optin_constructs_subclass(tiny, monkeypatch):
    cfg, params, _ = tiny
    monkeypatch.setenv("VDA_STREAM_SLIDE", "1")
    s = StreamingDepth(params, cfg, input_size=56)
    assert type(s) is SlidingStreamingDepth


def test_slide_rejects_int8(tiny):
    cfg, params, _ = tiny
    with pytest.raises(ValueError):
        SlidingStreamingDepth(params, cfg, input_size=56, cache_dtype="int8")
