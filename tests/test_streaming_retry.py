"""Crash consistency of the streaming bookkeeping.

A transient dispatch failure (tunnel hiccup, OOM retry) must leave the
stream's (id, order, free) state EXACTLY as before the failed submit, so a
retry reproduces the uninterrupted cache protocol bit-for-bit — the round-3
review found ``self.id`` advancing before dispatch, which shifted eviction
one step early after any retry.
"""

import numpy as np
import pytest

import jax

from vda_tpu.config import get_config
from vda_tpu.infer import StreamingDepth


def test_submit_failure_leaves_bookkeeping_intact(monkeypatch):
    from vda_tpu.models import init_video_depth_anything

    cfg = get_config("tiny")
    params = init_video_depth_anything(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(0)
    frames = (rng.random((30, 70, 90, 3)) * 255).astype(np.uint8)

    control = StreamingDepth(params, cfg, input_size=56)
    flaky = StreamingDepth(params, cfg, input_size=56)

    import vda_tpu.infer.streaming as sm
    real_step = sm._stream_step
    fail_at = {7, 13, 14}  # includes the STREAM_GAP-adjacent region
    state = {"n": 0, "armed": False}

    def maybe_fail(*a, **kw):
        if state["armed"]:
            state["n"] += 1
            if state["n"] in fail_at:
                raise RuntimeError("injected dispatch failure")
        return real_step(*a, **kw)

    monkeypatch.setattr(sm, "_stream_step", maybe_fail)

    outs_c, outs_f = [], []
    for f in frames:
        outs_c.append(np.asarray(control.submit(f)))
        before = (flaky.id, list(flaky.order), list(flaky.free))
        state["armed"] = True
        while True:
            try:
                outs_f.append(np.asarray(flaky.submit(f)))
                break
            except RuntimeError:
                after = (flaky.id, list(flaky.order), list(flaky.free))
                assert after == before  # nothing advanced on failure
        state["armed"] = False

    assert (flaky.id, flaky.order, flaky.free) == (
        control.id, control.order, control.free)
    np.testing.assert_array_equal(np.stack(outs_f), np.stack(outs_c))
