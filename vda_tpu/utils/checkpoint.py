"""Training checkpoint / resume.

The reference has model weights only — no training checkpoints or resume
(SURVEY §5.4).  This is the TPU-native training persistence layer: orbax
checkpointing of the full TrainState (params + optimizer moments + step) with
resume, plus the lightweight .npz export for inference params
(vda_tpu/utils/convert.py).
"""

from __future__ import annotations

import os
from typing import Optional


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_train_state(ckpt_dir: str, state, step: Optional[int] = None) -> str:
    """Save a TrainState under ckpt_dir/step_<N>."""
    import jax

    if step is None:
        step = int(jax.device_get(state.step))
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    _checkpointer().save(path, {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }, force=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.startswith("step_")]
    if not steps:
        return None
    return os.path.join(os.path.abspath(ckpt_dir), sorted(steps)[-1])


def restore_train_state(path: str, like_state):
    """Restore a TrainState saved by save_train_state (shapes/dtypes from
    ``like_state``)."""
    from vda_tpu.parallel.train import TrainState

    import orbax.checkpoint as ocp

    template = {
        "params": like_state.params,
        "opt_state": like_state.opt_state,
        "step": like_state.step,
    }
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    restored = _checkpointer().restore(path, item=template,
                                       restore_args=restore_args)

    # Array leaves inherit the template's (mesh-)shardings, but SCALAR
    # leaves (optimizer step counters like adam/MultiSteps `count`) were
    # created eagerly on the default device and restore COMMITTED to it —
    # jit then rejects them against the trainer's mesh context.  Hand them
    # back as host numpy (uncommitted) so jit replicates them freely.
    import jax
    import numpy as np

    def uncommit_scalars(leaf):
        return np.asarray(leaf) if getattr(leaf, "ndim", 1) == 0 else leaf

    restored = jax.tree_util.tree_map(uncommit_scalars, restored)
    return TrainState(restored["params"], restored["opt_state"],
                      restored["step"])


def resume_or_init(ckpt_dir: str, init_state):
    """Resume from the latest checkpoint in ckpt_dir, or return init_state."""
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return init_state, 0
    state = restore_train_state(path, init_state)
    import jax
    return state, int(jax.device_get(state.step))
