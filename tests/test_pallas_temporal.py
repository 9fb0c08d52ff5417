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


def test_attn_fused_matches_unfused_wide():
    """Attention-only fusion for wide modules (C=1024, the vitl mm0/mm1
    shape class) must match LN -> _temporal_attention -> residual."""
    from vda_tpu.ops.pallas_temporal import (
        attention_block_fused,
        attn_fused_supported,
    )

    cfg = get_config("vitl")
    c, bd, t = 1024, 37, 32
    assert attn_fused_supported(c, t, cfg.pe, cfg.num_attention_heads)
    assert not attn_fused_supported(256, t, cfg.pe, 8)   # narrow: full block
    p = T.init_temporal_module(jax.random.PRNGKey(6), c, cfg)
    bp = p["blocks"][0]
    h = jax.random.normal(jax.random.PRNGKey(7), (bd, t, c),
                          jnp.float32).astype(jnp.bfloat16)

    hn = T.layer_norm(bp["norms"][0], h, eps=1e-5)
    attn_out, _ = T._temporal_attention(bp["attn"][0], hn, cfg, None)
    ref = np.asarray(attn_out + h, np.float32)

    pe = jnp.asarray(T._sinusoidal_pe(t, c))
    got = np.asarray(attention_block_fused(
        bp["attn"][0], bp["norms"][0], h, pe,
        heads=cfg.num_attention_heads, seq=t), np.float32)
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(ref - got).max() / denom < 2e-2


def test_module_path_wide_fused_matches():
    """temporal_module_apply need_caches=False at C=1024 routes attention
    through the fused kernel and must match the cached path."""
    cfg = get_config("vitl")
    c = 1024
    p = T.init_temporal_module(jax.random.PRNGKey(8), c, cfg)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 32, 5, 6, c),
                          jnp.float32).astype(jnp.bfloat16)
    ref, caches = T.temporal_module_apply(p, x, cfg, None, need_caches=True)
    got, nc = T.temporal_module_apply(p, x, cfg, None, need_caches=False)
    assert len(caches) == 2 and nc == []
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    assert np.abs(r - g).max() / max(np.abs(r).max(), 1e-6) < 2e-2
