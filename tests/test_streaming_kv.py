"""KV-projection streaming cache vs the reference-faithful hidden-state cache.

The "kv" fast path (models/temporal._temporal_attention_kv) caches pre-PE
to_k/to_v projections and adds the projected position encoding per step,
using the linearity of the bias-free projections.  With RoPE the split is
exact; with APE it differs by one rounding of a sum.  These tests pin both
modes against each other over a full eviction cycle.
"""

import numpy as np
import pytest

import jax

from vda_tpu.config import get_config
from vda_tpu.infer import StreamingDepth
from vda_tpu.models import init_video_depth_anything


@pytest.fixture(scope="module")
def tiny():
    cfg = get_config("tiny")
    params = init_video_depth_anything(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(0)
    frames = (rng.random((46, 70, 90, 3)) * 255).astype(np.uint8)
    return cfg, params, frames


@pytest.mark.parametrize("pe", ["ape", "rope"])
def test_kv_matches_h_cache_fp32(tiny, pe):
    cfg, params, frames = tiny
    cfg = cfg.replace(pe=pe)
    s_h = StreamingDepth(params, cfg, input_size=56, fp32=True,
                         cache_kind="h")
    s_kv = StreamingDepth(params, cfg, input_size=56, fp32=True,
                          cache_kind="kv")
    # run past the eviction threshold (id > 42) to cover buffer wrap
    for i, f in enumerate(frames):
        dh = s_h(f)
        dkv = s_kv(f)
        scale = max(float(np.abs(dh).max()), 1e-6)
        err = float(np.abs(dh - dkv).max()) / scale
        tol = 1e-5 if pe == "rope" else 1e-4  # rope: exact split; ape: one
        #                                       rounding of (h + pe) per step
        assert err < tol, f"frame {i} ({pe}): rel err {err:.2e}"


def test_kv_matches_h_cache_bf16(tiny):
    cfg, params, frames = tiny
    s_h = StreamingDepth(params, cfg, input_size=56, cache_kind="h")
    s_kv = StreamingDepth(params, cfg, input_size=56, cache_kind="kv")
    worst = 0.0
    for f in frames[:12]:
        dh = s_h(f)
        dkv = s_kv(f)
        scale = max(float(np.abs(dh).max()), 1e-6)
        worst = max(worst, float(np.abs(dh - dkv).max()) / scale)
    # bf16: the split sum costs ~1 ulp per step on top of existing noise
    assert worst < 0.05, f"bf16 kv-vs-h rel err {worst:.2e}"
