"""Fused attention+out-projection block kernel vs the split XLA path.

VERDICT r4 #7: fold the encoder attention out-projection (plus LayerScale
and the residual add) into the Pallas kernel epilogue so the (B, N, C)
attention output never round-trips HBM.  These tests pin the fused kernel's
numerics against the stock block at small shapes in interpreter mode; the
on-chip A/B lives in scripts/ab_fuse_proj.py and the ROADMAP ledger.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vda_tpu.config import EncoderConfig
from vda_tpu.models import dinov2


def _tiny_cfg():
    return EncoderConfig(
        embed_dim=128, depth=2, num_heads=4, patch_size=14,
        ffn_layer="mlp", mlp_ratio=4.0, init_values=1e-5,
    )


def _block_params(key, cfg):
    return dinov2.init_block(key, cfg)


@pytest.mark.parametrize("n", [96, 176, 256])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_block_matches_split(n, dtype, monkeypatch):
    cfg = _tiny_cfg()
    key = jax.random.PRNGKey(0)
    p = _block_params(key, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, n, cfg.embed_dim),
                          jnp.float32).astype(dtype)

    monkeypatch.delenv("VDA_ATTN_FUSE_PROJ", raising=False)
    ref = dinov2.block_apply(p, x, cfg, attn_impl="pallas")
    monkeypatch.setenv("VDA_ATTN_FUSE_PROJ", "1")
    got = dinov2.block_apply(p, x, cfg, attn_impl="pallas")

    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_fused_block_respects_valid_len(monkeypatch):
    """Lane-padded tokens (padded-encoder fast path): pad keys are masked."""
    cfg = _tiny_cfg()
    p = _block_params(jax.random.PRNGKey(2), cfg)
    n, np_len = 100, 128
    x = jax.random.normal(jax.random.PRNGKey(3), (2, n, cfg.embed_dim))
    xp = jnp.pad(x, ((0, 0), (0, np_len - n), (0, 0)))

    monkeypatch.delenv("VDA_ATTN_FUSE_PROJ", raising=False)
    ref = dinov2.block_apply(p, x, cfg, attn_impl="pallas")
    monkeypatch.setenv("VDA_ATTN_FUSE_PROJ", "1")
    got = dinov2.block_apply(p, xp, cfg, attn_impl="pallas", valid_len=n)

    np.testing.assert_allclose(np.asarray(got[:, :n]), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fuse_gate_excludes_wide_models():
    """vitg's C=1536 resident set exceeds the VMEM guard; vitl fits."""
    from vda_tpu.ops.pallas_attention import attn_proj_fits

    assert attn_proj_fits(1376, 16, 64)          # vitl window shape
    assert not attn_proj_fits(1376, 24, 64)      # vitg C=1536


def test_fused_encoder_end_to_end(monkeypatch):
    """encode() with the flag on matches the flag off through taps."""
    cfg = EncoderConfig(embed_dim=64, depth=4, num_heads=4, patch_size=14,
                        ffn_layer="mlp", mlp_ratio=4.0, init_values=1e-5)
    params = dinov2.init_encoder(jax.random.PRNGKey(4), cfg)
    img = jax.random.normal(jax.random.PRNGKey(5), (1, 56, 56, 3))

    monkeypatch.delenv("VDA_ATTN_FUSE_PROJ", raising=False)
    ref = dinov2.encode(params, img, cfg, tap_idx=(1, 3),
                        attn_impl="pallas")
    monkeypatch.setenv("VDA_ATTN_FUSE_PROJ", "1")
    got = dinov2.encode(params, img, cfg, tap_idx=(1, 3),
                        attn_impl="pallas")
    for (gt, gc), (rt, rc) in zip(got, ref):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(rt),
                                   rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(rc),
                                   rtol=3e-5, atol=3e-5)
