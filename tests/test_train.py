"""Trainer: sharded steps decrease the loss; checkpoint/resume round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vda_tpu.models import init_video_depth_anything
from vda_tpu.parallel.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
)


@pytest.fixture(scope="module")
def tiny_state(tiny_cfg):
    params = init_video_depth_anything(jax.random.PRNGKey(0), tiny_cfg)
    # random init can leave the final ReLU dead (all-negative bias) -> zero
    # gradients; give the output conv a positive bias like a trained model
    b = params["head"]["output_conv2"]["conv1"]["b"]
    params["head"]["output_conv2"]["conv1"]["b"] = b + 0.5
    optimizer = make_optimizer(learning_rate=1e-3)
    return init_train_state(params, optimizer), optimizer


def _batch(tiny_cfg, seed=0):
    rng = np.random.default_rng(seed)
    s = tiny_cfg.vit.img_size
    b, t = 1, 2
    return {
        "video": jnp.asarray(rng.random((b, t, s, s, 3)), jnp.float32),
        "depth": jnp.asarray(rng.random((b, t, s, s)) * 3 + 0.2, jnp.float32),
        "mask": jnp.ones((b, t, s, s), jnp.bool_),
    }


def test_train_step_decreases_loss(tiny_cfg, tiny_state):
    state, optimizer = tiny_state
    step = jax.jit(make_train_step(tiny_cfg, optimizer))
    batch = _batch(tiny_cfg)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_checkpoint_roundtrip(tiny_cfg, tiny_state, tmp_path):
    from vda_tpu.utils.checkpoint import (
        latest_checkpoint,
        resume_or_init,
        save_train_state,
    )

    state, optimizer = tiny_state
    step = jax.jit(make_train_step(tiny_cfg, optimizer))
    state, _ = step(state, _batch(tiny_cfg))

    ckpt_dir = str(tmp_path / "ckpts")
    path = save_train_state(ckpt_dir, state)
    assert latest_checkpoint(ckpt_dir) == path

    fresh = init_train_state(
        init_video_depth_anything(jax.random.PRNGKey(9), tiny_cfg), optimizer)
    restored, start = resume_or_init(ckpt_dir, fresh)
    assert start == int(state.step)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state continues training
    restored, metrics = step(restored, _batch(tiny_cfg, seed=1))
    assert np.isfinite(float(metrics["total_loss"]))


def test_resume_or_init_without_checkpoints(tiny_cfg, tiny_state, tmp_path):
    from vda_tpu.utils.checkpoint import resume_or_init

    state, _ = tiny_state
    restored, start = resume_or_init(str(tmp_path / "none"), state)
    assert start == 0 and restored is state
