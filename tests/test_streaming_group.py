"""submit_group (k frames per dispatch) must reproduce sequential submits.

The group step replays the exact per-frame context/eviction bookkeeping and
runs the cache-coupled head stage sequentially in-graph, so the cache state
is bit-identical to k submits; the encoder and the output tail are batched
(per-frame-independent phases), so the depths match the frame-by-frame path
to reduction-order noise only (rel <1e-5 under fp32, ~1 bf16 ulp in bf16).
"""

import numpy as np

import jax

from vda_tpu.config import get_config
from vda_tpu.infer import StreamingDepth
from vda_tpu.models import init_video_depth_anything


def test_group_matches_sequential():
    cfg = get_config("tiny")
    params = init_video_depth_anything(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(0)
    frames = (rng.random((13, 70, 90, 3)) * 255).astype(np.uint8)

    seq = StreamingDepth(params, cfg, input_size=56, fp32=True)
    ref = [np.asarray(seq.submit(f)) for f in frames]

    grp = StreamingDepth(params, cfg, input_size=56, fp32=True)
    got = [np.asarray(grp.submit(frames[0]))]
    for start in (1, 5, 9):  # 3 groups of 4
        out = np.asarray(grp.submit_group(frames[start:start + 4]))
        got.extend(out)

    assert grp.order == seq.order and grp.free == seq.free
    for i, (a, b) in enumerate(zip(ref, got)):
        scale = max(np.abs(a).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        assert err < 1e-5, f"frame {i}: rel err {err:.2e}"


def test_group_requires_init():
    cfg = get_config("tiny")
    params = init_video_depth_anything(jax.random.PRNGKey(2), cfg)
    s = StreamingDepth(params, cfg, input_size=56)
    frames = np.zeros((2, 70, 90, 3), np.uint8)
    try:
        s.submit_group(frames)
        raise AssertionError("expected RuntimeError before init")
    except RuntimeError:
        pass
