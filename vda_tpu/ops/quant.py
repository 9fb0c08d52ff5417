"""Opt-in int8 (W8A8 dynamic) matmul path for the encoder's large matmuls.

The v5e MXU runs int8 at ~2x the bf16 rate, but XLA's int8 dot_general
measures exactly the bf16 rate (scripts/bench_int8.py) — only a Pallas
kernel engages the fast path (~397 vs ~225 TF/s pure-matmul,
scripts/bench_int8_pallas.py).  This module provides:

  * ``quantize_weight``: symmetric per-output-channel int8 weights
  * ``int8_linear``: dynamic per-row activation quantization (host XLA, one
    pass) + a Pallas int8 matmul with the dequantization (row scale x column
    scale) and bias fused into the epilogue

Accuracy: weight+activation symmetric int8 on ViT-style matmuls carries
~0.5-1% relative error per layer (bounded in tests/test_quant.py).  End-to-
end depth accuracy is NOT validated against real checkpoints yet (no egress
in this environment), so the path is NOT wired into the model hot path
(demoted r3 after the e2e measurement below): use ``quantize_weight`` +
``int8_linear`` directly, or benchmark the kernel standalone via
``scripts/bench_int8_pallas.py``.
No reference counterpart (the reference has no quantized path).

Measured (vitl window, v5e): 11.39 vs 11.46 ms/frame bf16 — ~0.6%.  The
standalone 1.8x matmul speedup does not translate because the window is not
matmul-throughput-bound at these shapes (see the CLAUDE.md perf-log note on
isolated-kernel wins); the path stays available for deployments where the
encoder matmuls do dominate (larger batches/resolutions) and as the
foundation for weight-only int8 (halved weight HBM traffic).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def interpret_mode() -> bool:
    return os.environ.get("VDA_PALLAS_INTERPRET", "0") == "1"


_interpret = interpret_mode


def quantize_weight(w):
    """(K, N) float -> (w_q int8 (K, N), w_s f32 (N,)) symmetric per-column
    (per-output-channel)."""
    w32 = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w32 / s[None, :]), -127, 127).astype(jnp.int8)
    return q, s


def _kernel(x_ref, w_ref, sx_ref, sw_ref, b_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    y = acc * sx_ref[...] * sw_ref[...]
    y = y + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def _int8_matmul(xq, wq, sx, sw, b, out_dtype):
    m, k = xq.shape
    n = wq.shape[1]
    bm = 512 if m % 512 == 0 else (256 if m % 256 == 0 else m)
    # keep x/w blocks (double-buffered) well inside VMEM for K up to 4096
    bn = max(512, 1024 // max(k // 2048, 1))
    if n % bn:
        # pick the largest 128-multiple divisor of n under the VMEM budget
        # instead of falling back to the full width (a (k, n) single block
        # compile-fails or OOMs VMEM on large unaligned n)
        divisors = [d for d in range(bn, 0, -128) if n % d == 0]
        if not divisors:
            raise ValueError(
                f"int8_linear needs a 128-aligned output width, got n={n}")
        bn = divisors[0]
    out = pl.pallas_call(
        _kernel,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k + k * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xq, wq, sx, sw, b)
    return out


def int8_linear(p, x):
    """Drop-in ``linear`` replacement for int8-quantized params.

    p: {"w_q" (K, N) int8, "w_s" (N,) f32, optional "b" (N,)}.
    x: (..., K) float (bf16/f32).  Dynamic symmetric per-row activation
    quantization; returns x.dtype.
    """
    shape = x.shape
    k = shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    pad = (-m) % 256
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    x32 = x2.astype(jnp.float32)
    sx = jnp.max(jnp.abs(x32), axis=1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    n = p["w_q"].shape[1]
    b = p.get("b")
    b32 = (jnp.zeros((1, n), jnp.float32) if b is None
           else b.astype(jnp.float32).reshape(1, n))
    y = _int8_matmul(xq, p["w_q"], sx, p["w_s"].reshape(1, n), b32, x.dtype)
    if pad:
        y = y[:m]
    return y.reshape(*shape[:-1], n)
