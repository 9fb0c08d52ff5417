"""RoPE positional-encoding mode parity (pe='rope', reference
motion_module/attention.py:403-429 + motion_module.py:233-237)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import requires_torch
from vda_tpu.config import EncoderConfig, ModelConfig
from vda_tpu.models.temporal import (
    _apply_rope,
    _rope_tables,
    init_temporal_module,
    temporal_module_apply,
)


@requires_torch
def test_rope_tables_match_reference():
    import torch

    from tests.torch_ref import import_reference
    import_reference()
    from video_depth_anything.motion_module.attention import (
        apply_rotary_emb,
        precompute_freqs_cis,
    )

    dim, end = 64, 32
    freqs = precompute_freqs_cis(dim, end)
    rng = np.random.default_rng(0)
    xq = rng.standard_normal((3, end, dim)).astype(np.float32)
    xk = rng.standard_normal((3, end, dim)).astype(np.float32)
    rq, rk = apply_rotary_emb(torch.from_numpy(xq), torch.from_numpy(xk),
                              freqs)

    cos, sin = _rope_tables(dim, end)
    oq = _apply_rope(jnp.asarray(xq), jnp.asarray(cos)[None],
                     jnp.asarray(sin)[None])
    ok = _apply_rope(jnp.asarray(xk), jnp.asarray(cos)[None],
                     jnp.asarray(sin)[None])
    np.testing.assert_allclose(np.asarray(oq), rq.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ok), rk.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_rope_temporal_module_runs_and_caches():
    vit = EncoderConfig(embed_dim=64, depth=2, num_heads=2, img_size=56)
    cfg = ModelConfig("tiny", 32, (32, 32, 32, 32), (0, 0, 1, 1), vit,
                      num_frames=4, pe="rope")
    p = init_temporal_module(jax.random.PRNGKey(0), 32, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4, 32))
    y, caches = temporal_module_apply(p, x, cfg)
    assert y.shape == x.shape
    assert len(caches) == 2

    # cached path consistency: last frame with cache == full run's last frame
    y1, _ = temporal_module_apply(p, x[:, -1:], cfg,
                                  cache_list=[c[:, :-1] for c in caches])
    np.testing.assert_allclose(np.asarray(y1[:, 0]), np.asarray(y[:, -1]),
                               rtol=1e-4, atol=1e-5)
