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


def test_drop_path_stochastic_depth():
    """DropPath semantics (reference drop_path.py:18-35): per-sample zeroing
    with 1/keep scaling; identity at rate 0; expectation preserved."""
    import jax
    import jax.numpy as jnp

    from vda_tpu.ops.layers import drop_path

    x = jnp.ones((512, 3, 5))
    rng = jax.random.PRNGKey(0)
    y0 = drop_path(x, 0.0, rng)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))

    y = np.asarray(drop_path(x, 0.4, rng))
    # each sample is either fully zero or fully scaled by 1/0.6
    per_sample = y.reshape(512, -1)
    kept = per_sample[:, 0] != 0
    assert 0.4 < kept.mean() < 0.8  # ~0.6 expected
    np.testing.assert_allclose(per_sample[kept], 1.0 / 0.6, rtol=1e-6)
    assert np.all(per_sample[~kept] == 0.0)


def test_encoder_drop_path_schedule_and_training_path():
    """drop_path_rate threads through encode: training output differs from
    inference, rate 0 is bit-identical, and the train step accepts it."""
    import jax
    import jax.numpy as jnp

    from vda_tpu.config import get_config
    from vda_tpu.models.vda import forward, init_video_depth_anything

    cfg = get_config("tiny")
    params = init_video_depth_anything(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 4, 56, 56, 3)), jnp.float32)

    base = np.asarray(forward(params, x, cfg))
    same = np.asarray(forward(params, x, cfg, drop_path_rate=0.0,
                              rng=jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(base, same)

    # tiny cfg has depth 2: block 1 gets the full rate under the linear rule
    dropped = np.asarray(forward(params, x, cfg, drop_path_rate=0.95,
                                 rng=jax.random.PRNGKey(1)))
    assert np.abs(dropped - base).max() > 0  # branch actually dropped/scaled

    from vda_tpu.parallel.train import (
        init_train_state,
        make_train_step,
    )

    step = make_train_step(cfg, micro_batch_size=4, remat=False,
                           drop_path_rate=0.2)
    state = init_train_state(params)
    batch = {
        "video": x,
        "depth": jnp.ones((1, 4, 56, 56), jnp.float32),
        "mask": jnp.ones((1, 4, 56, 56), jnp.float32),
    }
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state2.step) == 1


def test_grad_accumulation_matches_large_batch(tiny_cfg):
    """k micro-steps with MultiSteps(k) produce the params of one step on
    the concatenated batch: the averaged k mean-gradients equal the
    full-batch mean gradient for equal-size sub-batches.

    The equivalence is asserted with SGD (linear in the gradient, so fp
    reduction-order noise stays ~1e-7).  Adam cannot be compared this way:
    its FIRST update is ~lr * g/|g|, so near-zero gradient entries flip
    sign under reduction-order noise and diverge by 2*lr — the adamw path
    gets a semantic check (no update mid-accumulation, update at the
    boundary) instead."""
    import optax

    params = init_video_depth_anything(jax.random.PRNGKey(3), tiny_cfg)
    b = params["head"]["output_conv2"]["conv1"]["b"]
    params["head"]["output_conv2"]["conv1"]["b"] = b + 0.5

    b1, b2 = _batch(tiny_cfg, seed=1), _batch(tiny_cfg, seed=2)
    big = {k: jnp.concatenate([b1[k], b2[k]], axis=0) for k in b1}

    opt_a = optax.MultiSteps(optax.sgd(1e-3), every_k_schedule=2)
    step_a = jax.jit(make_train_step(tiny_cfg, opt_a))
    st = init_train_state(params, opt_a)
    st, _ = step_a(st, b1)
    # first micro-step accumulates only: params unchanged
    same = jax.tree.map(
        lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)),
        st.params, params)
    assert all(jax.tree.leaves(same))
    st, _ = step_a(st, b2)

    step_b = jax.jit(make_train_step(tiny_cfg, optax.sgd(1e-3)))
    st_big = init_train_state(params, optax.sgd(1e-3))
    st_big, _ = step_b(st_big, big)

    diffs = jax.tree.map(
        lambda x, y: float(np.abs(np.asarray(x, np.float64)
                                  - np.asarray(y, np.float64)).max()),
        st.params, st_big.params)
    assert max(jax.tree.leaves(diffs)) < 1e-6

    # adamw accumulation wiring (make_optimizer accum_steps): no param
    # change mid-accumulation, a real update at the boundary
    opt = make_optimizer(learning_rate=1e-3, accum_steps=2)
    step = jax.jit(make_train_step(tiny_cfg, opt))
    st = init_train_state(params, opt)
    st, _ = step(st, b1)
    same = jax.tree.map(
        lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)),
        st.params, params)
    assert all(jax.tree.leaves(same))
    st, _ = step(st, b2)
    moved = jax.tree.map(
        lambda x, y: float(np.abs(np.asarray(x, np.float64)
                                  - np.asarray(y, np.float64)).max()),
        st.params, params)
    assert max(jax.tree.leaves(moved)) > 0.0


def test_trainer_metrics_jsonl(tiny_cfg, tmp_path):
    """train(metrics_path=...) appends one parseable line per step."""
    import json

    from vda_tpu.parallel.trainer import train

    params = init_video_depth_anything(jax.random.PRNGKey(0), tiny_cfg)
    s = tiny_cfg.vit.img_size
    ndev = len(jax.devices())

    def data():
        rng = np.random.default_rng(0)
        while True:
            yield {
                "video": rng.random((ndev, 2, s, s, 3)).astype(np.float32),
                "depth": (rng.random((ndev, 2, s, s)) * 3 + 0.2).astype(
                    np.float32),
                "mask": np.ones((ndev, 2, s, s), bool),
            }

    path = str(tmp_path / "metrics.jsonl")
    train(tiny_cfg, params, data(), num_steps=2, metrics_path=path,
          accum=2, schedule=True, prefetch=0)
    lines = [json.loads(l) for l in open(path)]
    assert [l["step"] for l in lines] == [0, 1]
    assert all(np.isfinite(l["total_loss"]) and "wall_s" in l for l in lines)


def test_trainer_resume_on_mesh(tiny_cfg, tmp_path):
    """Resume must (a) restore a checkpoint whose scalar optimizer counters
    were committed to one device without fighting the trainer's mesh context
    (utils/checkpoint.restore_train_state uncommits scalars), and (b) skip
    the data batches the crashed run already consumed, so the resumed stream
    continues where the unbroken run would be."""
    from vda_tpu.parallel.trainer import train

    params = init_video_depth_anything(jax.random.PRNGKey(0), tiny_cfg)
    s = tiny_cfg.vit.img_size
    ndev = len(jax.devices())
    pulled = []

    def data():
        i = 0
        while True:
            pulled.append(i)
            rng = np.random.default_rng(100 + i)
            yield {
                "video": rng.uniform(0, 1, (ndev, 2, s, s, 3)).astype(
                    np.float32),
                "depth": rng.uniform(0.1, 2, (ndev, 2, s, s)).astype(
                    np.float32),
                "mask": np.ones((ndev, 2, s, s), bool),
            }
            i += 1

    ck = str(tmp_path / "ck")
    train(tiny_cfg, params, data(), num_steps=2, ckpt_dir=ck, ckpt_every=1,
          schedule=True, warmup_steps=1)
    pulled.clear()
    st = train(tiny_cfg, params, data(), num_steps=4, ckpt_dir=ck,
               ckpt_every=10, schedule=True, warmup_steps=1)
    assert int(st.step) == 4
    # batches 0,1 were skipped (pulled but not trained on), then 2,3 used
    assert pulled[:4] == [0, 1, 2, 3]
