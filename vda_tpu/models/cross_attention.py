"""Generic cross-attention + feed-forward library, functional JAX.

Rebuild of reference video_depth_anything/motion_module/attention.py (the
HuggingFace-diffusers-derived CrossAttention/FeedForward):

  * ``cross_attention``: self- or cross-attention (encoder_hidden_states),
    bias-free to_q/k/v, optional token GroupNorm, optional added-kv
    projections, additive attention mask (reference attention.py:125-211)
  * feed-forward activations: GEGLU, GELU, ApproximateGELU
    (reference attention.py:296-400)
  * RoPE helpers live in vda_tpu/models/temporal.py (_rope_tables/_apply_rope)

The reference's xFormers/sliced execution paths are memory workarounds; here
one fused path (ops.attention) covers all sizes.  The temporal attention used
by the depth head subclasses this math in vda_tpu/models/temporal.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vda_tpu.ops.attention import dot_product_attention
from vda_tpu.ops.layers import (
    gelu,
    init_linear,
    linear,
)


def init_cross_attention(key, query_dim: int,
                         cross_attention_dim: Optional[int] = None,
                         heads: int = 8, dim_head: int = 64,
                         bias: bool = False,
                         added_kv_proj_dim: Optional[int] = None,
                         norm_num_groups: Optional[int] = None):
    """Params for reference CrossAttention.__init__ (attention.py:45-91).

    norm_num_groups adds the optional pre-attention GroupNorm params
    (reference attention.py:130-131) consumed by
    ``cross_attention(group_norm_groups=...)``."""
    inner = heads * dim_head
    cross = cross_attention_dim or query_dim
    ks = jax.random.split(key, 6)
    p = {
        "to_q": init_linear(ks[0], query_dim, inner, bias=bias),
        "to_k": init_linear(ks[1], cross, inner, bias=bias),
        "to_v": init_linear(ks[2], cross, inner, bias=bias),
        "to_out": init_linear(ks[3], inner, query_dim),
    }
    if added_kv_proj_dim is not None:
        p["add_k_proj"] = init_linear(ks[4], added_kv_proj_dim, cross)
        p["add_v_proj"] = init_linear(ks[5], added_kv_proj_dim, cross)
    if norm_num_groups is not None:
        p["group_norm"] = {"scale": jnp.ones((inner,), jnp.float32),
                           "bias": jnp.zeros((inner,), jnp.float32)}
    return p


def cross_attention(p, hidden_states, heads: int,
                    encoder_hidden_states=None, attention_mask=None,
                    group_norm_groups: Optional[int] = None,
                    impl: str = "xla"):
    """Reference CrossAttention.forward (attention.py:125-180).

    hidden_states: (B, N, C).  encoder_hidden_states: optional (B, M, C').
    attention_mask: must already be an ADDITIVE mask broadcastable to
    (B, heads, N, M) — callers own the reference's pad/repeat_interleave
    preprocessing (attention.py:157-162).
    """
    b, n, _ = hidden_states.shape
    h = hidden_states
    if group_norm_groups is not None:
        # token-wise GroupNorm over channels (reference attention.py:130-131
        # applies nn.GroupNorm on the transposed (B, C, N) layout)
        gn = p["group_norm"]
        c = h.shape[-1]
        g = group_norm_groups
        x32 = h.astype(jnp.float32).reshape(b, n, g, c // g)
        mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 3), keepdims=True)
        x32 = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        h = (x32.reshape(b, n, c) * gn["scale"] + gn["bias"]).astype(h.dtype)

    q = linear(p["to_q"], h)
    inner = q.shape[-1]
    dh = inner // heads

    if "add_k_proj" in p:
        # added-kv path (reference attention.py:137-149): self keys/values
        # concatenated after the encoder projections.  The reference uses the
        # added projections unconditionally and fails loudly without a
        # context — mirror that instead of silently degrading to self-attn.
        if encoder_hidden_states is None:
            raise ValueError(
                "add_k_proj/add_v_proj params present but "
                "encoder_hidden_states is None (added-kv attention requires "
                "a context, reference attention.py:137-149)")
        k = jnp.concatenate([linear(p["add_k_proj"], encoder_hidden_states),
                             linear(p["to_k"], h)], axis=1)
        v = jnp.concatenate([linear(p["add_v_proj"], encoder_hidden_states),
                             linear(p["to_v"], h)], axis=1)
    else:
        context = (encoder_hidden_states
                   if encoder_hidden_states is not None else h)
        k = linear(p["to_k"], context)
        v = linear(p["to_v"], context)

    qh = q.reshape(b, -1, heads, dh)
    kh = k.reshape(b, -1, heads, dh)
    vh = v.reshape(b, -1, heads, dh)

    if attention_mask is not None:
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) * (dh ** -0.5)
        logits = logits + attention_mask.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    else:
        o = dot_product_attention(qh, kh, vh, scale=dh ** -0.5, impl=impl)
    return linear(p["to_out"], o.reshape(b, -1, inner))


# ---------------------------------------------------------------------------
# feed-forward variants (reference attention.py:296-400)
# ---------------------------------------------------------------------------

def init_feed_forward(key, dim: int, dim_out: Optional[int] = None,
                      mult: int = 4, activation_fn: str = "geglu"):
    inner = int(dim * mult)
    dim_out = dim_out or dim
    k1, k2 = jax.random.split(key)
    proj_out = 2 * inner if activation_fn == "geglu" else inner
    return {
        "proj": init_linear(k1, dim, proj_out),
        "out": init_linear(k2, inner, dim_out),
    }


def feed_forward(p, x, activation_fn: str = "geglu"):
    """activation_fn is a static argument (params stay array-only pytrees)."""
    act = activation_fn
    h = linear(p["proj"], x)
    if act == "geglu":
        h1, gate = jnp.split(h, 2, axis=-1)
        h = h1 * gelu(gate)
    elif act == "gelu":
        h = gelu(h)
    elif act == "geglu-approximate":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        raise NotImplementedError(act)
    return linear(p["out"], h)
