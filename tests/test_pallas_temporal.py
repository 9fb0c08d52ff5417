"""Fused temporal-block kernel vs the unfused path (interpreter mode).

The fused kernel (ops/pallas_temporal.py) must reproduce the unfused
LN -> APE -> qkv -> block-diag attention -> out -> residual (x2) -> GEGLU FF
chain of models/temporal.py within bf16 rounding: same fp32-stat LayerNorm,
same fp32-accumulated matmuls, same deferred softmax normalization.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vda_tpu.config import get_config
from vda_tpu.models import temporal as T
from vda_tpu.ops.pallas_temporal import fused_block_supported


def _block_params(key, c):
    cfg = get_config("vitl")
    return T.init_temporal_module(key, c, cfg)["blocks"][0], cfg


@pytest.mark.parametrize("c,bd,t", [(256, 70, 32), (128, 513, 8)])
def test_fused_block_matches_unfused(c, bd, t):
    from vda_tpu.ops.pallas_temporal import temporal_block_fused

    bp, cfg = _block_params(jax.random.PRNGKey(0), c)
    assert fused_block_supported(c, t, cfg.pe, cfg.num_attention_heads)
    h = jax.random.normal(jax.random.PRNGKey(1), (bd, t, c), jnp.float32)
    h = h.astype(jnp.bfloat16)

    ref, _ = T._transformer_block(bp, h, cfg, None)
    pe = jnp.asarray(T._sinusoidal_pe(t, c))
    got = temporal_block_fused(bp, h, pe, heads=cfg.num_attention_heads,
                               seq=t)

    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    denom = max(np.abs(r).max(), 1e-6)
    assert np.abs(r - g).max() / denom < 2e-2, (
        f"max rel {np.abs(r - g).max() / denom:.2e}")


def test_fused_module_path_matches_unfused_module():
    """temporal_module_apply(need_caches=False) must equal the cached path's
    output (the fused kernel sits behind that flag)."""
    cfg = get_config("vitl")
    c = 256
    p = T.init_temporal_module(jax.random.PRNGKey(2), c, cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 7, 10, c),
                          jnp.float32).astype(jnp.bfloat16)

    ref, caches = T.temporal_module_apply(p, x, cfg, None, need_caches=True)
    got, no_caches = T.temporal_module_apply(p, x, cfg, None,
                                             need_caches=False)
    assert len(caches) == cfg.num_attention_blocks
    assert no_caches == []
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    denom = max(np.abs(r).max(), 1e-6)
    assert np.abs(r - g).max() / denom < 2e-2


def test_fused_gate_conditions():
    assert not fused_block_supported(256, 32, "rope", 8)   # rope: post-proj
    assert not fused_block_supported(1024, 32, "ape", 8)   # weights > VMEM
    assert not fused_block_supported(256, 128, "ape", 8)   # long seq
    assert not fused_block_supported(192, 32, "ape", 8)    # lane-unaligned
    assert not fused_block_supported(256, 32, "ape", 8, n_attn=1)
    assert fused_block_supported(256, 32, "ape", 8)

