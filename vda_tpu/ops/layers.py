"""Functional NN primitives, TPU-first.

Conventions (deliberately different from the torch reference — these are the
TPU-native layouts):

  * images/features are NHWC (channels-last), conv kernels are HWIO
  * linear weights are stored (in, out) so application is `x @ w`
  * params are plain nested dicts of jnp arrays (pytrees), apply fns are pure
  * normalization statistics are always computed in float32; matmul outputs use
    ``preferred_element_type=float32`` only where the reference keeps an fp32
    island (see models/dpt.py output head)

Parity notes: LayerNorm eps matches reference dinov2.py:95 (1e-6) /
motion_module.py (1e-5 default torch LayerNorm).  GELU is the exact (erf)
form in fp32 — matching torch nn.GELU default at reference
dinov2_layers/mlp.py:24 and F.gelu at motion_module/attention.py:352 — but
deliberately switches to the tanh approximation for bfloat16 inputs (the
production inference dtype): the ~1e-3 relative difference is below bf16
quantization noise while the tanh form is much cheaper on the VPU (see
``gelu``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gelu(x):
    """GELU matching torch nn.GELU / F.gelu (exact erf) in fp32.

    In bfloat16 the exact-vs-tanh difference (~1e-3 rel) is below the bf16
    quantization noise (~8e-3), and the tanh form is much cheaper on the VPU
    (~45 ms/window saved at vitl), so bf16 uses the tanh approximation.
    """
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def linear(p, x, precision=None):
    """x @ w + b.  w: (in, out); b optional.

    Deliberately has NO quantized-weight dispatch: the Pallas int8 path
    (ops/quant.py) measured only ~0.9% end-to-end at vitl with accuracy
    unvalidated on real weights, so it was demoted out of this hot path
    (round-3 decision; see ops/quant.py and scripts/bench_int8_pallas.py
    for the kernel and the measured result).
    """
    y = jnp.matmul(x, p["w"].astype(x.dtype), precision=precision)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def layer_norm(p, x, eps: float = 1e-6):
    """LayerNorm over the last axis; statistics in fp32.

    On TPU, lane-aligned shapes dispatch to the single-HBM-pass Pallas kernel
    (ops/pallas_norm.py) — numerics are identical (fp32 stats, same formula);
    XLA materializes fp32 intermediates and runs ~10x off the bandwidth floor.
    """
    from vda_tpu.ops.attention import _on_tpu
    from vda_tpu.ops.pallas_norm import ln_supported
    if _on_tpu() and ln_supported(x):
        from vda_tpu.ops.pallas_norm import fused_layer_norm
        return fused_layer_norm(x, p["scale"], p["bias"], eps)
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def group_norm(p, x, num_groups: int, eps: float = 1e-6):
    """GroupNorm over NHWC input; statistics in fp32.

    Matches torch nn.GroupNorm semantics on NCHW inputs (stats over
    (C/g, H, W) per group per instance) — reference motion_module.py:84.
    """
    dtype = x.dtype
    n, h, w, c = x.shape
    g = num_groups
    x32 = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 4), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def drop_path(x, rate: float, rng, scale_by_keep: bool = True):
    """Stochastic depth on a residual branch (reference
    dinov2_layers/drop_path.py:18-35): per-SAMPLE Bernoulli zeroing with the
    survivors scaled by 1/keep_prob.  Training-only — inference never calls
    this (identity at rate 0)."""
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    if scale_by_keep and keep > 0.0:
        mask = mask / jnp.asarray(keep, x.dtype)
    return x * mask


def conv2d(p, x, stride: int = 1, padding="SAME", accumulate_fp32=False):
    """2D conv, NHWC / HWIO.

    padding: "SAME", "VALID", or an int (symmetric spatial padding, torch
    style).  accumulate_fp32=True emits an fp32 result from low-precision
    operands (MXU-native fp32 accumulation).
    """
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    w = p["w"].astype(x.dtype)
    kwargs = {}
    if accumulate_fp32:
        kwargs["preferred_element_type"] = jnp.float32
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        **kwargs,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _s2d_weight(w):
    """Embed a (3,3,Cin,Cout) kernel into a (4,4,Cin,4*Cout) stride-2 kernel.

    With the input padded by 1 on each side, a stride-2 VALID conv with this
    kernel computes all four 2x2-block output pixels at once: output channel
    (di*2+dj)*Cout+co at block (i,j) equals the stride-1 SAME conv's output
    at pixel (2i+di, 2j+dj).  Tap mapping: kernel row r = di+u (u the
    original 3x3 row), zero where r-di leaves [0,3).
    """
    cin, cout = w.shape[2], w.shape[3]
    w4 = jnp.zeros((4, 4, cin, 2, 2, cout), w.dtype)
    for di in range(2):
        for dj in range(2):
            w4 = w4.at[di:di + 3, dj:dj + 3, :, di, dj, :].set(w)
    return w4.reshape(4, 4, cin, 4 * cout)


def conv2d_3x3_s2d(p, x, accumulate_fp32=False):
    """3x3 stride-1 SAME conv computed as a stride-2 conv with the kernel
    embedded at the four 2x2-block offsets (``_s2d_weight``).

    For small output channel counts the plain conv wastes MXU lanes (the DPT
    output island's 128->32 conv at 518^2 uses 32 of 128 lanes, ~49 TF/s
    measured).  This form has 16/9 the nominal FLOPs but full lane
    utilization, needs NO input rearrangement (only the output
    depth-to-space), and matches ``conv2d(p, x, padding=1)`` exactly.
    Requires even H and W.
    """
    w = p["w"]
    assert w.shape[:2] == (3, 3), "s2d form implemented for 3x3 only"
    b, h, ww, cin = x.shape
    assert h % 2 == 0 and ww % 2 == 0, "s2d conv needs even spatial dims"
    cout = w.shape[3]
    kwargs = {"preferred_element_type": jnp.float32} if accumulate_fp32 else {}
    y2 = jax.lax.conv_general_dilated(
        x, _s2d_weight(w.astype(x.dtype)),
        window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kwargs)
    y = y2.reshape(b, h // 2, ww // 2, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, cout)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv_transpose_same_stride(p, x, k: int):
    """ConvTranspose2d with kernel_size == stride and no padding.

    This is the only deconv shape the reference uses (dpt.py:70-82: 4x/4 and
    2x/2).  With k == s each input pixel independently produces a k x k output
    block, so the op is exactly one matmul + reshape — ideal for the MXU,
    no gradient-of-conv lowering needed.

    p['w']: (Cin, k, k, Cout) — converted from torch (Cin, Cout, kH, kW).
    """
    n, h, w_, cin = x.shape
    wk = p["w"].astype(x.dtype)  # (Cin, k, k, Cout)
    cout = wk.shape[-1]
    y = jnp.einsum("nhwc,cklo->nhkwlo", x, wk)
    y = y.reshape(n, h * k, w_ * k, cout)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Initializers (torch-compatible defaults, for training / random tests)
# ---------------------------------------------------------------------------

def _fan_in_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_linear(key, d_in, d_out, bias=True, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    p = {"w": _fan_in_uniform(k1, (d_in, d_out), d_in, dtype)}
    if bias:
        p["b"] = _fan_in_uniform(k2, (d_out,), d_in, dtype)
    return p


def init_conv2d(key, k, cin, cout, bias=True, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    fan_in = cin * k * k
    p = {"w": _fan_in_uniform(k1, (k, k, cin, cout), fan_in, dtype)}
    if bias:
        p["b"] = _fan_in_uniform(k2, (cout,), fan_in, dtype)
    return p


def init_conv_transpose(key, k, cin, cout, bias=True, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    fan_in = cout * k * k  # torch ConvTranspose fan_in counts out channels
    p = {"w": _fan_in_uniform(k1, (cin, k, k, cout), fan_in, dtype)}
    if bias:
        p["b"] = _fan_in_uniform(k2, (cout,), fan_in, dtype)
    return p


def init_layer_norm(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_zeros_linear(d_in, d_out, bias=True, dtype=jnp.float32):
    p = {"w": jnp.zeros((d_in, d_out), dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p
