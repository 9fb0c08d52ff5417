"""Tensor-parallel streaming (StreamingDepth(mesh=...)) vs single-device.

The TP stream shards params head-aligned over the model axis and the kv
cache over its channel dim (whole temporal-attention heads per shard); the
bookkeeping protocol is host-side and identical, so depths must match the
single-device stream to reduction-order noise.
"""

import numpy as np
import pytest

import jax

from vda_tpu.infer import StreamingDepth
from vda_tpu.models import init_video_depth_anything
from vda_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup(tiny_cfg):
    params = init_video_depth_anything(jax.random.PRNGKey(5), tiny_cfg)
    rng = np.random.default_rng(1)
    frames = (rng.random((8, 70, 90, 3)) * 255).astype(np.uint8)
    return params, frames


def _mesh_or_skip(tp):
    devices = jax.devices("cpu")
    if len(devices) < 2 * tp:
        pytest.skip("needs virtual devices")
    return make_mesh(n_devices=2 * tp, tp=tp, devices=devices)


def test_streaming_tp_matches_single_device(setup, tiny_cfg):
    params, frames = setup
    mesh = _mesh_or_skip(tp=2)
    ref = StreamingDepth(params, tiny_cfg, input_size=56, fp32=True)
    tps = StreamingDepth(params, tiny_cfg, input_size=56, fp32=True,
                         mesh=mesh)
    assert tps.mesh is mesh
    for f in frames:
        d_ref = np.asarray(ref.submit(f))
        d_tp = np.asarray(tps.submit(f))
        np.testing.assert_allclose(d_tp, d_ref, rtol=1e-4, atol=1e-5)
    assert tps.order == ref.order  # protocol bookkeeping identical


def test_streaming_tp_group_matches(setup, tiny_cfg):
    params, frames = setup
    mesh = _mesh_or_skip(tp=2)
    ref = StreamingDepth(params, tiny_cfg, input_size=56, fp32=True)
    tps = StreamingDepth(params, tiny_cfg, input_size=56, fp32=True,
                         mesh=mesh)
    ref.submit(frames[0])
    tps.submit(frames[0])
    d_ref = np.stack([np.asarray(ref.submit(f)) for f in frames[1:5]])
    d_tp = np.asarray(tps.submit_group(frames[1:5]))
    np.testing.assert_allclose(d_tp, d_ref, rtol=1e-4, atol=1e-5)


def test_streaming_tp_crosses_eviction_threshold(setup, tiny_cfg):
    """VERDICT r4 #8: the anchor-eviction bookkeeping (order.pop(1) once the
    window slides past STREAM_GAP, reference video_depth_stream.py:155-160)
    must behave identically under channel-sharded TP caches.  48 steps cross
    every bookkeeping regime: warmup replication, eviction onset (step 11),
    and the full 42-entry steady-state ring."""
    params, _ = setup
    mesh = _mesh_or_skip(tp=2)
    rng = np.random.default_rng(7)
    frames = (rng.random((48, 70, 90, 3)) * 255).astype(np.uint8)
    ref = StreamingDepth(params, tiny_cfg, input_size=56, fp32=True)
    tps = StreamingDepth(params, tiny_cfg, input_size=56, fp32=True,
                         mesh=mesh)
    for i, f in enumerate(frames):
        d_ref = np.asarray(ref.submit(f))
        d_tp = np.asarray(tps.submit(f))
        np.testing.assert_allclose(
            d_tp, d_ref, rtol=1e-4, atol=1e-5,
            err_msg=f"TP stream diverged at step {i}")
        # order bookkeeping must match EVERY step, not just at the end
        assert tps.order == ref.order, f"order drift at step {i}"
        assert tps.id == ref.id
    # steady state reached: the cache is at capacity and has evicted
    from vda_tpu.config import STREAM_MAX_CACHE
    assert len(ref.order) == STREAM_MAX_CACHE


def test_streaming_tp_int8_runs(setup, tiny_cfg):
    params, frames = setup
    mesh = _mesh_or_skip(tp=2)
    tps = StreamingDepth(params, tiny_cfg, input_size=56, fp32=True,
                         mesh=mesh, cache_dtype="int8")
    ref = StreamingDepth(params, tiny_cfg, input_size=56, fp32=True,
                         cache_dtype="int8")
    for f in frames[:4]:
        d_ref = np.asarray(ref.submit(f))
        d_tp = np.asarray(tps.submit(f))
        np.testing.assert_allclose(d_tp, d_ref, rtol=1e-4, atol=1e-5)


def test_streaming_tp_rejects_experimental(setup, tiny_cfg):
    params, _ = setup
    mesh = _mesh_or_skip(tp=2)
    with pytest.raises(ValueError, match="experimental"):
        StreamingDepth(params, tiny_cfg, input_size=56, ring=True, mesh=mesh)
