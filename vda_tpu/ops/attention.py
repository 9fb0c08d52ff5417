"""Multi-head attention dispatch.

Two hot shapes in this framework (reference SURVEY §5.7):
  * spatial ViT attention: batch B*T (=32), seq 1370, heads 6/12/16, dh 64
    (replaces the reference's xFormers memory_efficient_attention,
    dinov2_layers/attention.py:65-82)
  * temporal attention: batch B*H*W (~1.4k-5.5k), seq<=32, heads 8
    (reference motion_module/attention.py:256-293)

``dot_product_attention`` picks the implementation:
  * "xla"    — einsum attention, softmax in fp32 (always correct; the score
               matrices for the temporal shape are tiny so this is also fast)
  * "pallas" — fused flash-attention kernel (vda_tpu/ops/pallas_attention.py),
               used for the long-seq spatial shape on TPU
  * "auto"   — pallas on TPU when seq is long and shapes are tile-friendly,
               else xla
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _tpu_present() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _on_tpu() -> bool:
    """True when Pallas TPU kernels should be used.

    VDA_DISABLE_PALLAS=1 forces the XLA paths even with a TPU present —
    needed when computation is deliberately placed on the host CPU (the
    engine's cpu_fallback tier): this predicate tests device PRESENCE, not
    placement, and Mosaic kernels don't lower for the CPU backend.  The env
    check is deliberately OUTSIDE the cached device probe so flipping the
    variable mid-process (the ladder does) takes effect immediately.
    """
    import os

    if os.environ.get("VDA_DISABLE_PALLAS", "0") == "1":
        return False
    return _tpu_present()


def _xla_attention(q, k, v, scale: float):
    """q: (B, Nq, H, D); k/v: (B, Nk, H, D).  Softmax in fp32."""
    dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * jnp.float32(scale)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def dot_product_attention(q, k, v, scale: float | None = None,
                          impl: str = "auto"):
    """Scaled dot-product attention over (B, N, H, D) tensors."""
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    if impl == "auto":
        use_pallas = (
            _on_tpu()
            and q.shape[1] >= 512          # long-seq spatial shape
            and q.shape[1] == k.shape[1]
            and d % 8 == 0
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        from vda_tpu.ops.pallas_attention import flash_attention
        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)


def packed_self_attention(q, k, v, heads: int, scale: float | None = None,
                          impl: str = "auto", segment_lengths=None):
    """Self-attention over head-packed (B, N, H*D) tensors — the fused-qkv
    native layout, avoiding all per-head reshapes on the pallas path.

    segment_lengths: static tuple of per-sequence lengths for variable-length
    packed batches (requires B == 1, N == sum(segment_lengths)); attention is
    block-diagonal over the segments — the NestedTensorBlock equivalent
    (reference dinov2_layers/block.py:204-252)."""
    b, n, hd = q.shape
    d = hd // heads
    if scale is None:
        scale = d ** -0.5
    if segment_lengths is not None:
        if b != 1:
            raise ValueError("segment_lengths requires a packed batch (B=1)")
        if impl == "auto":
            impl = "pallas" if (_on_tpu() and d % 8 == 0) else "xla"
        if impl == "pallas":
            from vda_tpu.ops.pallas_attention import segment_attention
            out = segment_attention(q[0], k[0], v[0], heads=heads,
                                    scale=scale,
                                    segment_lengths=segment_lengths)
            return out[None]
        # xla fallback: per-segment attention (exact block-diagonal math)
        outs = []
        off = 0
        for ln in segment_lengths:
            qs = q[:, off:off + ln].reshape(1, ln, heads, d)
            ks = k[:, off:off + ln].reshape(1, ln, heads, d)
            vs = v[:, off:off + ln].reshape(1, ln, heads, d)
            outs.append(_xla_attention(qs, ks, vs, scale).reshape(1, ln, hd))
            off += ln
        return jnp.concatenate(outs, axis=1)
    if impl == "auto":
        impl = "pallas" if (_on_tpu() and n >= 512 and d % 8 == 0) else "xla"
    if impl == "pallas":
        from vda_tpu.ops.pallas_attention import flash_attention_packed
        return flash_attention_packed(q, k, v, heads=heads, scale=scale)
    qh = q.reshape(b, n, heads, d)
    kh = k.reshape(b, n, heads, d)
    vh = v.reshape(b, n, heads, d)
    return _xla_attention(qh, kh, vh, scale).reshape(b, n, hd)
