"""Single checkpoint/model loading path shared by every entry point.

Replaces the reference pattern of re-implementing model-config + torch.load
in each app (reference run.py:45-54, app.py, colab_processor.py,
external_engine/engine.py:211-241)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

from vda_tpu.config import ModelConfig, checkpoint_name, get_config


def load_model_params(
    encoder: str,
    metric: bool = False,
    checkpoint: Optional[str] = None,
    random_init: bool = False,
    cast_bf16: bool = True,
    cfg: Optional[ModelConfig] = None,
) -> Tuple[ModelConfig, dict]:
    """Resolve (cfg, params) from a .pth (reference format), native .npz, or
    random init.  cast_bf16 pre-casts matrix weights for bf16 inference
    (halves HBM weight traffic); pass False for fp32 runs."""
    import jax

    from vda_tpu.models import init_video_depth_anything
    from vda_tpu.utils.convert import (
        cast_params_for_inference,
        load_params_npz,
        load_torch_checkpoint,
    )

    if cfg is None:
        cfg = get_config(encoder, metric=metric)
    if random_init:
        params = init_video_depth_anything(jax.random.PRNGKey(0), cfg)
    else:
        ckpt = checkpoint or os.path.join(
            "./checkpoints", checkpoint_name(encoder, metric) + ".pth")
        if not os.path.exists(ckpt):
            raise FileNotFoundError(
                f"checkpoint not found: {ckpt} — pass an explicit checkpoint "
                f"path, run scripts/get_weights.sh, or use random init "
                f"(testing only)")
        if ckpt.endswith(".npz"):
            template = init_video_depth_anything(jax.random.PRNGKey(0), cfg)
            params = load_params_npz(ckpt, template)
        else:
            params = load_torch_checkpoint(ckpt, cfg)
    if cast_bf16:
        params = cast_params_for_inference(params)
    return cfg, params
