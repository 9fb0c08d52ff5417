"""Sharded training step.

The reference ships the loss but no trainer (SURVEY.md §3.5: "no trainer
exists").  This is the TPU-native trainer around it: optax AdamW, params +
optimizer state sharded by the TP rules in parallel/mesh.py, batch sharded
over the data axis, gradients reduced by GSPMD.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from vda_tpu.config import ModelConfig
from vda_tpu.loss import video_depth_loss
from vda_tpu.models.vda import forward


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(learning_rate: float = 1e-5, weight_decay: float = 1e-2,
                   warmup_steps: int = 0, total_steps: int = 0,
                   clip_norm: float = 0.0, accum_steps: int = 1):
    """AdamW, optionally with linear warmup -> cosine decay (the standard
    fine-tuning schedule; the reference ships no trainer to compare against)
    and global-norm gradient clipping.

    total_steps > 0 enables the schedule (peak = learning_rate, floor =
    learning_rate / 10); warmup_steps is the linear ramp from 0, both
    counted in OPTIMIZER updates (i.e. accumulation groups, not
    micro-steps).

    accum_steps > 1 wraps the whole chain in optax.MultiSteps: gradients
    of k consecutive train_step calls are averaged and applied as one
    AdamW update — reaching a large effective batch (B x k) without the
    ACTIVATION memory of a bigger batch.  Note MultiSteps does add a
    params-sized fp32 gradient accumulator to opt_state (and so to
    checkpoints); the saving is in activations, not optimizer state.
    """
    if total_steps > 0:
        warmup = max(warmup_steps, 1)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate,
            warmup_steps=warmup,
            decay_steps=max(total_steps, warmup + 1),
            end_value=learning_rate / 10.0)
    else:
        lr = learning_rate
    opt = optax.adamw(lr, weight_decay=weight_decay)
    if clip_norm > 0.0:
        opt = optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    if accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum_steps)
    return opt


def make_train_step(cfg: ModelConfig, optimizer=None,
                    micro_batch_size: int | None = None,
                    remat: bool = True,
                    drop_path_rate: float = 0.0,
                    augment_hw: tuple | None = None,
                    augment_seed: int = 0) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    batch: dict(video (B,T,H,W,3) RAW RGB in [0, 1], depth (B,T,H,W),
    mask (B,T,H,W)).  ImageNet normalization is applied INSIDE the step so
    training inputs match the inference preprocessing
    (utils/transform.preprocess_frames) — a fine-tune of converted weights
    must see the same input statistics the checkpoint was trained on.
    micro_batch_size defaults to the full window (no tail chunking) because
    lax.scan over a sharded batch dim would force resharding.

    drop_path_rate > 0 enables encoder stochastic depth (the DINOv2
    fine-tuning recipe, reference drop_path.py:18-35 + dinov2.py:116-119);
    the per-step rng is folded from the step counter, so training remains a
    pure function of (state, batch).

    augment_hw=(h, w) applies the on-device clip augmentation
    (utils/augment.augment_batch) INSIDE the step — one dispatch, no
    intermediate batch materialized between two jits, XLA free to overlap
    the crop matmuls with the forward.  The rng folds ``augment_seed`` with
    state.step, so a resumed run replays the same augmentation stream.
    """
    if optimizer is None:
        optimizer = make_optimizer()

    from vda_tpu.utils.transform import IMAGENET_MEAN, IMAGENET_STD

    def loss_fn(params, batch, rng):
        mb = micro_batch_size or (batch["video"].shape[0]
                                  * batch["video"].shape[1])
        video = ((batch["video"] - jnp.asarray(IMAGENET_MEAN, jnp.float32))
                 / jnp.asarray(IMAGENET_STD, jnp.float32))
        pred = forward(params, video, cfg, attn_impl="xla",
                       micro_batch_size=mb, remat=remat,
                       drop_path_rate=drop_path_rate, rng=rng)
        losses = video_depth_loss(pred.astype(jnp.float32),
                                  batch["depth"].astype(jnp.float32),
                                  batch["mask"])
        return losses["total_loss"], losses

    def train_step(state: TrainState, batch):
        # ONE per-step base key; augmentation and drop-path take disjoint
        # split branches so their randomness streams never correlate (with
        # a shared fold_in(key, step) they would be bit-identical)
        base = jax.random.fold_in(jax.random.PRNGKey(augment_seed),
                                  state.step)
        akey, dkey = jax.random.split(base)
        if augment_hw is not None:
            from vda_tpu.utils.augment import augment_batch

            batch = augment_batch(akey, batch, out_hw=tuple(augment_hw))
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch,
            dkey if drop_path_rate > 0.0 else None)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(new_params, new_opt_state, state.step + 1), metrics

    return train_step


def init_train_state(params, optimizer=None) -> TrainState:
    if optimizer is None:
        optimizer = make_optimizer()
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[])
