"""Training driver: sharded steps + checkpoint/resume.

The reference ships the loss but no trainer (SURVEY §3.5).  This loop wires
the sharded train step (parallel/train.py) to orbax persistence
(utils/checkpoint.py) so a fine-tune can actually be run and resumed.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax

from vda_tpu.config import ModelConfig
from vda_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    param_shardings,
    to_tp_layout,
)
from vda_tpu.parallel.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from vda_tpu.utils.checkpoint import resume_or_init, save_train_state


def train(
    cfg: ModelConfig,
    params,
    data_iter: Iterable[dict],
    num_steps: int,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 500,
    learning_rate: float = 1e-5,
    tp: int = 1,
    sp: bool = False,
    log_fn: Callable[[int, dict], None] = None,
    warmup_steps: int = 0,
    schedule: bool = False,
    clip_norm: float = 0.0,
    augment_hw: Optional[tuple] = None,
    augment_seed: int = 0,
    prefetch: int = 2,
    accum: int = 1,
    metrics_path: Optional[str] = None,
):
    """Run ``num_steps`` of VideoDepthLoss fine-tuning.

    data_iter yields dicts with video (B,T,H,W,3) raw RGB in [0,1],
    depth (B,T,H,W), mask (B,T,H,W); B must be divisible by the
    data-parallel degree.  ImageNet normalization happens inside the step.

    schedule=True uses linear warmup (``warmup_steps``) -> cosine decay to
    lr/10 over ``num_steps``; clip_norm > 0 adds global-norm clipping.
    augment_hw=(h, w) applies the on-device clip augmentation
    (utils/augment.augment_batch: consistent random-resized-crop + hflip +
    photometric jitter) cropping each batch to (h, w); the rng folds
    ``augment_seed`` with the step index, so a resumed run replays the
    same augmentation stream.

    prefetch > 0 runs the data iterator in a daemon thread that eagerly
    device_puts each batch with the data-parallel sharding (depth =
    ``prefetch``), overlapping host decode + H2D with device compute
    (utils/data.prefetch_to_device); 0 keeps the synchronous path.

    accum > 1 averages the gradients of ``accum`` consecutive steps into one
    AdamW update (optax.MultiSteps — effective batch = B x accum); the LR
    schedule then counts optimizer updates, so it spans num_steps/accum.

    metrics_path appends one JSON line per step ({step, losses, wall_s});
    each write fetches the metrics to host, adding a device sync per step —
    fine for fine-tuning-scale runs, disable for microbenchmarks.

    Under tp > 1 the params are converted to the head-aligned TP layout
    (mesh.to_tp_layout — checkpoints save in that layout; run
    ``from_tp_layout`` before exporting weights elsewhere) and the model
    runs with cfg.tp_layout=True so attention projections stay
    shard-aligned.

    sp=True (requires tp > 1) adds Megatron sequence parallelism: encoder
    norm-region activations are token-sharded over the model axis
    (activation memory / tp there; the TP all-reduces become
    reduce-scatter + all-gather pairs where the backend supports the
    rewrite).  Token count (num_patches + 1) should divide by tp.
    """
    mesh = make_mesh(tp=tp)
    if sp and tp <= 1:
        raise ValueError("sp=True requires tp > 1")
    if tp > 1:
        params = to_tp_layout(params)
        cfg = cfg.replace(tp_layout=True)
        if sp:
            import dataclasses as _dc
            cfg = cfg.replace(vit=_dc.replace(cfg.vit, seq_shard=True))
    params = jax.device_put(params, param_shardings(params, mesh))
    # the LR schedule counts OPTIMIZER UPDATES (accumulation groups), so
    # both the horizon and the warmup convert from micro-steps by // accum
    optimizer = make_optimizer(learning_rate,
                               warmup_steps=warmup_steps // accum,
                               total_steps=(max(num_steps // accum, 1)
                                            if schedule else 0),
                               clip_norm=clip_norm, accum_steps=accum)
    state = init_train_state(params, optimizer)
    start_step = 0
    if ckpt_dir:
        state, start_step = resume_or_init(ckpt_dir, state)

    step_fn = jax.jit(make_train_step(cfg, optimizer,
                                      augment_hw=augment_hw,
                                      augment_seed=augment_seed))

    import itertools

    from jax.sharding import NamedSharding, PartitionSpec as P

    if start_step:
        # a resumed run must see the SAME data stream as an unbroken one:
        # skip the batches the crashed run already consumed (one-time host
        # decode cost; samplers are deterministic per seed)
        data_iter = itertools.islice(data_iter, start_step, None)
    take = max(num_steps - start_step, 0)
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    if prefetch > 0:
        from vda_tpu.utils.data import sized_prefetch
        data_iter = sized_prefetch(data_iter, batch_sharding,
                                   buffer_size=prefetch, limit=take)
    else:
        # bound the pull count so a finite dataset never decodes a batch
        # that would only be discarded by the loop bound
        data_iter = itertools.islice(data_iter, take)
    t0 = time.time()
    with jax.set_mesh(mesh):
        for step, batch in enumerate(data_iter, start=start_step):
            if step >= num_steps:
                break
            batch = jax.device_put(batch, batch_sharding)
            state, metrics = step_fn(state, batch)
            if metrics_path:
                import json
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(
                        {"step": step,
                         **{k: float(v) for k, v in metrics.items()},
                         "wall_s": round(time.time() - t0, 3)}) + "\n")
            if log_fn is not None:
                log_fn(step, metrics)
            elif step % 10 == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"step {step}: total={m['total_loss']:.4f} "
                      f"spatial={m['spatial_loss']:.4f} "
                      f"stable={m['stable_loss']:.4f} "
                      f"({time.time() - t0:.1f}s)")
            if ckpt_dir and (step + 1) % ckpt_every == 0:
                save_train_state(ckpt_dir, state)
    if ckpt_dir:
        save_train_state(ckpt_dir, state)
    return state
