"""utils/data: threaded prefetch + eager device transfer."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vda_tpu.utils.data import prefetch_to_device, sized_prefetch


def test_order_and_termination():
    items = [{"x": np.full((2, 2), i, np.float32)} for i in range(7)]
    out = list(prefetch_to_device(iter(items)))
    assert len(out) == 7
    for i, item in enumerate(out):
        assert float(item["x"][0, 0]) == i


def test_exception_propagates():
    def bad():
        yield {"x": np.zeros(2)}
        raise RuntimeError("decode failed")

    it = prefetch_to_device(bad())
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_backpressure():
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    it = prefetch_to_device(gen(), buffer_size=2)
    next(it)
    time.sleep(0.3)
    # 1 consumed + 2 queued + at most 1 in-flight in the producer
    assert len(produced) <= 4
    it.close()


def test_limit_caps_infinite_iter():
    def infinite():
        i = 0
        while True:
            yield i
            i += 1

    out = list(sized_prefetch(infinite(), limit=5))
    assert out == [0, 1, 2, 3, 4]


def test_device_put_with_sharding():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vda_tpu.parallel.mesh import DATA_AXIS, make_mesh

    mesh = make_mesh(tp=1)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    n = mesh.devices.size
    batches = [{"video": np.ones((n, 2, 8, 8, 3), np.float32) * i}
               for i in range(3)]
    out = list(prefetch_to_device(iter(batches), sharding))
    assert len(out) == 3
    for i, b in enumerate(out):
        assert isinstance(b["video"], jax.Array)
        assert b["video"].sharding.is_equivalent_to(sharding, 5)
        assert float(b["video"][0, 0, 0, 0, 0]) == i


def test_trainer_prefetch_smoke():
    """The full train() loop with prefetch enabled runs and consumes exactly
    num_steps batches from an infinite iterator."""
    from vda_tpu.config import get_config
    from vda_tpu.models import init_video_depth_anything
    from vda_tpu.parallel.trainer import train

    cfg = get_config("tiny")
    params = init_video_depth_anything(jax.random.PRNGKey(0), cfg)
    pulled = []

    def data():
        i = 0
        while True:
            pulled.append(i)
            rng = np.random.default_rng(i)
            yield {
                "video": rng.uniform(0, 1, (8, 2, 28, 28, 3)).astype(
                    np.float32),
                "depth": rng.uniform(0.1, 2, (8, 2, 28, 28)).astype(
                    np.float32),
                "mask": np.ones((8, 2, 28, 28), bool),
            }
            i += 1

    logs = []
    train(cfg, params, data(), num_steps=2, prefetch=2,
          log_fn=lambda s, m: logs.append(s))
    assert logs == [0, 1]
    # limit= stops the producer: at most num_steps + buffer pulled
    assert len(pulled) <= 4
