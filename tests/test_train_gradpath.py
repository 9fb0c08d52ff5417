"""Differentiability and padding regressions from the round-3 review.

1. attn_impl="xla" (the train step's setting) must keep the whole forward
   autodiff-able: the fused Pallas temporal kernels have no VJP rule, and
   they engage for 128-aligned channels on TPU/interpret — invisible to the
   tiny-config tests (C=32) until a real training run crashed.
2. encode(remat=True, drop_path_rate>0) must not leak the Python-float rate
   through jax.checkpoint as a tracer (block_apply branches on it).
3. The TP-layout (3D qkv) attention branch must mask lane-pad KEYS out of
   the softmax when encode() pads the token dim.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_temporal_grad_with_fused_eligible_channels(monkeypatch):
    """jax.grad through temporal_module_apply at C=128 (fused-kernel
    eligible under interpret mode) must work when attn_impl='xla'."""
    monkeypatch.setenv("VDA_PALLAS_INTERPRET", "1")
    from vda_tpu.config import get_config
    from vda_tpu.models.temporal import init_temporal_module, temporal_module_apply

    cfg = get_config("tiny")
    p = init_temporal_module(jax.random.PRNGKey(0), 128, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 2, 2, 128),
                          jnp.float32)

    def loss(p):
        y, _ = temporal_module_apply(p, x, cfg, need_caches=False,
                                     attn_impl="xla")
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(p)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    # ...and the forward itself matches the fused path (auto) bit-close
    y_xla, _ = temporal_module_apply(p, x, cfg, need_caches=False,
                                     attn_impl="xla")
    y_auto, _ = temporal_module_apply(p, x, cfg, need_caches=False,
                                      attn_impl="auto")
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_auto),
                               rtol=2e-2, atol=2e-2)


def test_encode_remat_with_drop_path(tiny_cfg):
    """The advertised training default (remat=True) must accept stochastic
    depth: drop_path_rate is static through jax.checkpoint."""
    from vda_tpu.models import init_video_depth_anything
    from vda_tpu.models.dinov2 import encode

    params = init_video_depth_anything(jax.random.PRNGKey(0), tiny_cfg)
    s = tiny_cfg.vit.img_size
    x = jax.random.normal(jax.random.PRNGKey(1), (2, s, s, 3), jnp.float32)
    taps = tiny_cfg.intermediate_layer_idx
    feats = encode(params["pretrained"], x, tiny_cfg.vit, taps,
                   "xla", remat=True, drop_path_rate=0.3,
                   rng=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(feats[0][0])).all()

    # gradients flow through the remat+drop-path path
    def loss(p):
        f = encode(p, x, tiny_cfg.vit, taps, "xla", remat=True,
                   drop_path_rate=0.3, rng=jax.random.PRNGKey(2))
        return sum(jnp.sum(t ** 2) for t, _ in f)

    g = jax.grad(loss)(params["pretrained"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_tp_layout_attention_masks_pad_keys(tiny_cfg):
    """encode() with lane-padded tokens and TP-layout (3D qkv) params must
    give the same tap activations as the unpadded XLA path."""
    from vda_tpu.models import init_video_depth_anything
    from vda_tpu.models.dinov2 import _attention
    from vda_tpu.parallel.mesh import to_tp_layout

    params = init_video_depth_anything(jax.random.PRNGKey(0), tiny_cfg)
    tp_params = to_tp_layout(params)
    blk = tp_params["pretrained"]["blocks"][0]["attn"]
    assert blk["qkv"]["w"].ndim == 3  # layout actually converted

    n, d = 10, tiny_cfg.vit.embed_dim
    x = jax.random.normal(jax.random.PRNGKey(1), (2, n, d), jnp.float32)
    ref = _attention(blk, x, tiny_cfg.vit.num_heads, "xla")

    # pad the tokens like encode() does for the pallas granule and assert
    # the pad keys do not perturb the real rows
    x_pad = jnp.pad(x, ((0, 0), (0, 6), (0, 0)),
                    constant_values=37.0)  # loud garbage
    out = _attention(blk, x_pad, tiny_cfg.vit.num_heads, "xla", valid_len=n)
    np.testing.assert_allclose(np.asarray(out[:, :n]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
