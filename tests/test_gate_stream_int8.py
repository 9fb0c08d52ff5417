"""Egress-free int8 streaming-cache gate (scripts/gate_stream_int8.py) and
the cache_dtype default-resolution machinery it promoted.

The full-scale gate run happens on the chip; here the same harness runs at
tiny shapes to pin (a) the gate logic itself (agreement scoring, degeneracy
check), (b) the synthetic video being genuinely structured and moving, and
(c) the None->default resolution with its env revert hook.
"""

import os
import sys

import numpy as np
import pytest

import jax

from vda_tpu.infer import StreamingDepth
from vda_tpu.infer.streaming import _resolve_cache_dtype
from vda_tpu.models import init_video_depth_anything

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from gate_stream_int8 import run_gate, synthetic_video  # noqa: E402


def test_synthetic_video_is_structured_and_moving():
    frames = synthetic_video(6, 64)
    assert frames.shape == (6, 64, 64, 3) and frames.dtype == np.uint8
    for i in range(5):
        # consecutive frames genuinely differ (moving content)
        assert np.abs(frames[i + 1].astype(np.int32)
                      - frames[i].astype(np.int32)).mean() > 1.0
    # spatial structure, not constant or pure noise
    f = frames[0].astype(np.float32)
    assert f.std() > 10.0
    # smoothed texture => strong local correlation
    corr = np.corrcoef(f[:-1].ravel(), f[1:].ravel())[0, 1]
    assert corr > 0.5


def test_gate_tiny_model_passes(tiny_cfg):
    params = init_video_depth_anything(jax.random.PRNGKey(3), tiny_cfg)
    # nudge the output bias positive like the full gate does on the sd
    b = params["head"]["output_conv2"]["conv1"]["b"]
    params["head"]["output_conv2"]["conv1"]["b"] = jax.numpy.abs(b) + 0.5
    frames = synthetic_video(48, 56, seed=1)  # crosses eviction bookkeeping
    # tiny random-init depth is flatter than full-scale torch-init depth
    # (spread ~0.008 vs the 0.01 full-scale floor) — the tiny smoke keeps a
    # non-vacuous but shape-appropriate degeneracy floor
    result = run_gate(params=params, cfg=tiny_cfg, frames=frames,
                      input_size=56, threshold=0.99, min_spread=0.005)
    assert result["ok"], result
    assert result["delta1_min"] >= 0.99
    assert result["depth_rel_spread_median"] > 0.005


def test_cache_dtype_default_resolution(monkeypatch):
    monkeypatch.delenv("VDA_STREAM_CACHE_DTYPE", raising=False)
    monkeypatch.delenv("VDA_STREAM_KV8", raising=False)
    from vda_tpu.infer import streaming
    assert _resolve_cache_dtype(None, experimental=False) \
        == streaming._DEFAULT_CACHE_DTYPE
    # experimental flavors only support bf16 unless explicitly asked
    assert _resolve_cache_dtype(None, experimental=True) == "bf16"
    # explicit always wins
    assert _resolve_cache_dtype("bf16", experimental=False) == "bf16"
    # the revert hook: env overrides the promoted default
    monkeypatch.setenv("VDA_STREAM_CACHE_DTYPE", "bf16")
    assert _resolve_cache_dtype(None, experimental=False) == "bf16"
    monkeypatch.setenv("VDA_STREAM_CACHE_DTYPE", "int8")
    assert _resolve_cache_dtype(None, experimental=False) == "int8"
    # legacy bench env still forces int8
    monkeypatch.delenv("VDA_STREAM_CACHE_DTYPE", raising=False)
    monkeypatch.setenv("VDA_STREAM_KV8", "1")
    assert _resolve_cache_dtype(None, experimental=False) == "int8"


def test_streaming_constructor_resolves_default(tiny_cfg, monkeypatch):
    params = init_video_depth_anything(jax.random.PRNGKey(3), tiny_cfg)
    monkeypatch.setenv("VDA_STREAM_CACHE_DTYPE", "int8")
    s = StreamingDepth(params, tiny_cfg, input_size=56)
    assert s.cache_dtype == "int8"
    monkeypatch.setenv("VDA_STREAM_CACHE_DTYPE", "bf16")
    s = StreamingDepth(params, tiny_cfg, input_size=56)
    assert s.cache_dtype == "bf16"
    with pytest.raises(ValueError, match="cache_dtype"):
        StreamingDepth(params, tiny_cfg, input_size=56, cache_dtype="fp8")
