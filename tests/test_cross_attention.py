"""Generic cross-attention / feed-forward parity vs the torch reference."""

import numpy as np
import pytest

from tests.conftest import requires_torch

pytestmark = requires_torch


@pytest.fixture(scope="module")
def ref_attn_mod():
    from tests.torch_ref import import_reference
    import_reference()
    from video_depth_anything.motion_module import attention
    return attention


def _convert_ca(ca):
    """torch CrossAttention -> params pytree."""
    def t(w):
        return np.ascontiguousarray(w.detach().numpy().T)

    p = {
        "to_q": {"w": t(ca.to_q.weight)},
        "to_k": {"w": t(ca.to_k.weight)},
        "to_v": {"w": t(ca.to_v.weight)},
        "to_out": {"w": t(ca.to_out[0].weight),
                   "b": ca.to_out[0].bias.detach().numpy()},
    }
    if ca.to_q.bias is not None:
        p["to_q"]["b"] = ca.to_q.bias.detach().numpy()
        p["to_k"]["b"] = ca.to_k.bias.detach().numpy()
        p["to_v"]["b"] = ca.to_v.bias.detach().numpy()
    return p


def test_self_attention_parity(ref_attn_mod):
    import torch
    import jax.numpy as jnp
    from vda_tpu.models.cross_attention import cross_attention

    torch.manual_seed(0)
    ca = ref_attn_mod.CrossAttention(query_dim=64, heads=4, dim_head=16).eval()
    x = np.random.default_rng(0).standard_normal((2, 10, 64)).astype(np.float32)
    with torch.no_grad():
        ref = ca(torch.from_numpy(x)).numpy()
    ours = cross_attention(_convert_ca(ca), jnp.asarray(x), heads=4)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_cross_attention_parity(ref_attn_mod):
    import torch
    import jax.numpy as jnp
    from vda_tpu.models.cross_attention import cross_attention

    torch.manual_seed(1)
    ca = ref_attn_mod.CrossAttention(query_dim=64, cross_attention_dim=32,
                                     heads=4, dim_head=16).eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 10, 64)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, 32)).astype(np.float32)
    with torch.no_grad():
        ref = ca(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()
    ours = cross_attention(_convert_ca(ca), jnp.asarray(x), heads=4,
                           encoder_hidden_states=jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act", ["geglu", "gelu", "geglu-approximate"])
def test_feed_forward_parity(ref_attn_mod, act):
    import torch
    import jax.numpy as jnp
    from vda_tpu.models.cross_attention import feed_forward

    torch.manual_seed(2)
    ff = ref_attn_mod.FeedForward(48, mult=2, activation_fn=act).eval()
    x = np.random.default_rng(2).standard_normal((3, 5, 48)).astype(np.float32)
    with torch.no_grad():
        ref = ff(torch.from_numpy(x)).numpy()

    def t(w):
        return np.ascontiguousarray(w.detach().numpy().T)

    proj = ff.net[0].proj
    p = {
        "proj": {"w": t(proj.weight), "b": proj.bias.detach().numpy()},
        "out": {"w": t(ff.net[2].weight), "b": ff.net[2].bias.detach().numpy()},
    }
    ours = feed_forward(p, jnp.asarray(x), activation_fn=act)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)
# appended to tests/test_cross_attention.py and tests/test_ops.py


def test_group_norm_init_and_forward():
    """init_cross_attention(norm_num_groups=...) creates the params the
    group_norm_groups forward path consumes (round-3 review gap)."""
    import jax
    import numpy as np

    from vda_tpu.models.cross_attention import (
        cross_attention,
        init_cross_attention,
    )

    p = init_cross_attention(jax.random.PRNGKey(0), 64, heads=4, dim_head=16,
                             norm_num_groups=8)
    assert "group_norm" in p
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 64))
    out = cross_attention(p, h, heads=4, group_norm_groups=8)
    assert out.shape == (2, 10, 64)
    assert np.isfinite(np.asarray(out)).all()
