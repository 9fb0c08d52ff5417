"""Model smoke tests and streaming-cache consistency on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vda_tpu.models.vda import (
    forward,
    forward_depth,
    forward_features,
    init_video_depth_anything,
)


@pytest.fixture(scope="module")
def tiny_model(tiny_cfg):
    params = init_video_depth_anything(jax.random.PRNGKey(0), tiny_cfg)
    return params


def test_forward_shapes(tiny_model, tiny_cfg):
    b, t, s = 1, 4, tiny_cfg.vit.img_size
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, s, s, 3), jnp.float32)
    depth = forward(tiny_model, x, tiny_cfg)
    assert depth.shape == (b, t, s, s)
    assert np.all(np.asarray(depth) >= 0)


def test_forward_micro_batched_tail_matches_unchunked(tiny_model, tiny_cfg):
    """lax.scan micro-batching of the decoder tail must be a pure memory
    optimization (reference dpt_temporal.py:96-123)."""
    b, t, s = 1, 8, tiny_cfg.vit.img_size
    x = jax.random.normal(jax.random.PRNGKey(2), (b, t, s, s, 3), jnp.float32)
    d_chunked = forward(tiny_model, x, tiny_cfg, micro_batch_size=4)
    d_full = forward(tiny_model, x, tiny_cfg, micro_batch_size=t)
    np.testing.assert_allclose(np.asarray(d_chunked), np.asarray(d_full),
                               rtol=1e-4, atol=1e-5)


def test_cache_returns_eight_tensors(tiny_model, tiny_cfg):
    b, t, s = 1, 4, tiny_cfg.vit.img_size
    x = jax.random.normal(jax.random.PRNGKey(3), (b, t, s, s, 3), jnp.float32)
    feats = forward_features(tiny_model, x, tiny_cfg)
    depth, caches = forward_depth(tiny_model, feats, x.shape, tiny_cfg)
    assert len(caches) == 8
    for c in caches:
        assert c.ndim == 3 and c.shape[1] == t


def test_streaming_cache_matches_offline_last_frame(tiny_model, tiny_cfg):
    """Running the head on the last frame with the cache of the first T-1
    frames must reproduce the offline window's last-frame depth exactly
    (reference motion_module.py:249-274 cache semantics)."""
    b, t, s = 1, 4, tiny_cfg.vit.img_size
    x = jax.random.normal(jax.random.PRNGKey(4), (b, t, s, s, 3), jnp.float32)

    feats = forward_features(tiny_model, x, tiny_cfg)
    depth_full, caches = forward_depth(tiny_model, feats, x.shape, tiny_cfg)

    # Slice the last frame's features out of the SAME encoder pass so the
    # comparison isolates cache semantics from fp32 batch-reduction noise.
    x_last = x[:, -1:]
    feats_last = [(tok[-1:], cls[-1:]) for tok, cls in feats]
    cache_prefix = [c[:, :-1] for c in caches]
    depth_last, new_caches = forward_depth(
        tiny_model, feats_last, x_last.shape, tiny_cfg,
        cached_hidden_state_list=cache_prefix)

    np.testing.assert_allclose(
        np.asarray(depth_last[:, 0]), np.asarray(depth_full[:, -1]),
        rtol=2e-4, atol=2e-5)
    # new caches cover only the new frame
    for nc, full in zip(new_caches, caches):
        assert nc.shape[1] == 1
        np.testing.assert_allclose(np.asarray(nc[:, 0]),
                                   np.asarray(full[:, -1]),
                                   rtol=2e-4, atol=2e-5)


def test_forward_bf16_close_to_fp32(tiny_model, tiny_cfg):
    b, t, s = 1, 4, tiny_cfg.vit.img_size
    x = jax.random.normal(jax.random.PRNGKey(5), (b, t, s, s, 3), jnp.float32)
    d32 = np.asarray(forward(tiny_model, x, tiny_cfg))
    d16 = np.asarray(forward(tiny_model, x.astype(jnp.bfloat16), tiny_cfg))
    scale = max(np.abs(d32).max(), 1e-6)
    assert np.abs(d16.astype(np.float32) - d32).max() / scale < 0.1


def test_fold_out_conv1_matches_two_convs():
    """conv3x3 ∘ conv1x1 fold (models/dpt._fold_out_conv1) must be
    border-exact: the 1x1 bias must not leak through the 3x3 zero padding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vda_tpu.models.dpt import _fold_out_conv1
    from vda_tpu.ops.layers import conv2d, init_conv2d

    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    c, f = 16, 8
    p1 = init_conv2d(k1, 1, c, c)
    p2 = init_conv2d(k2, 3, c, f)
    x = jax.random.normal(k3, (2, 9, 11, c), jnp.float32)  # odd dims: borders

    ref = conv2d(p2, conv2d(p1, x, padding=0), padding=1)
    got = _fold_out_conv1(p1, p2, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_encoder_pad_granule_16_matches_128_and_xla(tiny_model, tiny_cfg):
    """VDA_PAD_GRANULE=16 (sublane-granule token pad, models/dinov2.encode)
    must give the same tap activations as the default 128 pad and the XLA
    path — the attention kernel masks keys past valid_len either way."""
    import os

    from vda_tpu.models.dinov2 import encode

    s = tiny_cfg.vit.img_size
    x = jax.random.normal(jax.random.PRNGKey(9), (2, s, s, 3), jnp.float32)
    taps = sorted(set(tiny_cfg.intermediate_layer_idx))
    enc = tiny_model["pretrained"]

    def run(granule, attn_impl):
        prev = os.environ.get("VDA_PAD_GRANULE")
        os.environ["VDA_PAD_GRANULE"] = str(granule)
        try:
            out = encode(enc, x, tiny_cfg.vit, taps, attn_impl=attn_impl)
        finally:
            if prev is None:
                os.environ.pop("VDA_PAD_GRANULE", None)
            else:
                os.environ["VDA_PAD_GRANULE"] = prev
        return [np.asarray(t) for pair in out for t in pair]

    ref = run(128, "xla")
    g128 = run(128, "pallas")
    g16 = run(16, "pallas")
    for a, b in zip(g128, g16):
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5)
    for a, b in zip(ref, g16):
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-4)
