"""Loss parity vs reference loss/loss.py (torch oracle)."""

import numpy as np
import pytest

from tests.conftest import requires_torch

pytestmark = requires_torch


@pytest.fixture(scope="module")
def ref_loss_mod():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_loss", "/root/reference/loss/loss.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _data(b=2, t=4, h=24, w=20, seed=0):
    rng = np.random.default_rng(seed)
    pred = rng.random((b, t, h, w)).astype(np.float32) * 5
    target = rng.random((b, t, h, w)).astype(np.float32) * 5 + 0.5
    mask = (rng.random((b, t, h, w)) > 0.2)
    return pred, target, mask


def test_video_depth_loss_parity(ref_loss_mod):
    import torch
    import jax.numpy as jnp
    from vda_tpu.loss import video_depth_loss

    pred, target, mask = _data()
    ref = ref_loss_mod.VideoDepthLoss()(
        torch.from_numpy(pred), torch.from_numpy(target),
        torch.from_numpy(mask))
    ours = video_depth_loss(jnp.asarray(pred), jnp.asarray(target),
                            jnp.asarray(mask))
    for key in ["spatial_loss", "stable_loss", "total_loss"]:
        np.testing.assert_allclose(float(ours[key]), float(ref[key]),
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=key)


def test_trimmed_mae_with_trim_parity(ref_loss_mod):
    import torch
    import jax.numpy as jnp
    from vda_tpu.loss.loss import trimmed_mae_loss

    rng = np.random.default_rng(1)
    pred = rng.random((8, 24, 20)).astype(np.float32)
    target = rng.random((8, 24, 20)).astype(np.float32)
    mask = (rng.random((8, 24, 20)) > 0.3).astype(np.float32)
    ref = ref_loss_mod.TrimmedMAELoss(trim=0.2)(
        torch.from_numpy(pred), torch.from_numpy(target),
        torch.from_numpy(mask))
    ours = trimmed_mae_loss(jnp.asarray(pred), jnp.asarray(target),
                            jnp.asarray(mask), trim=0.2)
    np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4)


def test_normalize_prediction_robust_parity(ref_loss_mod):
    import torch
    import jax.numpy as jnp
    from vda_tpu.loss.loss import normalize_prediction_robust

    rng = np.random.default_rng(2)
    target = rng.random((4, 24, 20)).astype(np.float32) * 3
    mask = (rng.random((4, 24, 20)) > 0.25).astype(np.float32)
    ref_n, (ref_m, ref_s) = ref_loss_mod.normalize_prediction_robust(
        torch.from_numpy(target), torch.from_numpy(mask))
    our_n, (our_m, our_s) = normalize_prediction_robust(
        jnp.asarray(target), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(our_m), ref_m.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(our_s), ref_s.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(our_n), ref_n.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_loss_differentiable():
    import jax
    import jax.numpy as jnp
    from vda_tpu.loss import video_depth_loss

    pred, target, mask = _data(seed=3)

    def f(p):
        return video_depth_loss(p, jnp.asarray(target),
                                jnp.asarray(mask))["total_loss"]

    g = jax.grad(f)(jnp.asarray(pred))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
