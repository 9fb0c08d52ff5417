"""Pallas fused LayerNorm (one HBM pass).

XLA lowers the straightforward fp32-stats LayerNorm over a (32, 1370, 1024)
bf16 tensor to multiple HBM passes (materialized fp32 upcast + separate
reduce/normalize fusions): measured 2.76 ms standalone on v5e where the
bandwidth floor (read 90 MB + write 90 MB at ~819 GB/s) is ~0.25 ms.  This
kernel reads each row tile once, computes mean/var in fp32 registers and
writes the normalized output — no fp32 intermediate ever touches HBM.

Rows are independent, so the ragged last row-block needs no masking: pallas
clips out-of-bounds stores and garbage rows never escape.

Backward: ``fused_layer_norm`` carries a custom VJP whose backward recomputes
through the plain XLA formula (vda_tpu.ops.layers.layer_norm math), keeping
the trainer path (parallel/train.py) fully differentiable.

Replaces torch ``nn.LayerNorm`` use at reference dinov2_layers/block.py:82-107
and dinov2.py:297-321 (numerics identical to fp32-stats LayerNorm).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return os.environ.get("VDA_PALLAS_INTERPRET", "0") == "1"


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _ln_2d(x2d, scale, bias, eps: float, block_rows: int | None = None):
    r, c = x2d.shape
    if block_rows is None:
        # per-tile fp32 working set is ~3 live copies (upcast, centered,
        # output); keep 3 * rows * C * 4 under ~6.3 MB of the 16 MB VMEM
        # stack (C=1024 -> 512 rows, C=4096 -> 128, C=8192 -> 64)
        block_rows = max(8, min(512, 6_300_000 // (c * 12) // 8 * 8))
    br = min(block_rows, r)
    kernel = functools.partial(_ln_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(r, br),),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), x2d.dtype),
        interpret=_interpret(),
    )(x2d, scale.reshape(1, c), bias.reshape(1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, scale, bias, eps: float = 1e-6):
    """LayerNorm over the last axis, fp32 statistics, single HBM pass.

    x: any rank >= 1 with last dim a multiple of 128 (lane granule).
    scale/bias: (C,).  Output dtype == x.dtype.
    """
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    return _ln_2d(x2d, scale, bias, eps).reshape(shape)


def _fln_fwd(x, scale, bias, eps):
    return fused_layer_norm(x, scale, bias, eps), (x, scale, bias)


def _fln_bwd(eps, res, g):
    x, scale, bias = res

    def ref(x, scale, bias):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)

    _, vjp = jax.vjp(ref, x, scale, bias)
    return vjp(g)


fused_layer_norm.defvjp(_fln_fwd, _fln_bwd)


def ln_supported(x) -> bool:
    """Shapes the fused kernel handles: last dim lane-aligned, >=2 dims."""
    return x.ndim >= 2 and x.shape[-1] % 128 == 0 and x.shape[-1] <= 8192
