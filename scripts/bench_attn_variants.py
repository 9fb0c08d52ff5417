#!/usr/bin/env python
"""On-chip ablation of the encoder attention kernel (vitl shape).

Variants isolate cost shares: matmul-only, no-mask, fp32-exp, block/group
geometry.  Uses the slope method (K=4 vs K=12 independent calls) to cancel
tunnel dispatch overhead.
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vda_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

B, N, H, D = 32, 1370, 16, 64
NP = 1408
FLOPS = 4 * B * N * N * H * D


def kernel(q_ref, k_ref, v_ref, o_ref, *, scale, valid_len, heads,
           mode="full", exp_dtype="bf16"):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    d = q.shape[-1] // heads
    nb = k.shape[0]
    mask = None
    if mode != "nomask" and valid_len < nb:
        col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], nb), 1)
        mask = col < valid_len

    def qk(h):
        return jax.lax.dot_general(
            q[:, h * d:(h + 1) * d], k[:, h * d:(h + 1) * d],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    s_next = qk(0)
    for h in range(heads):
        s = s_next
        if h + 1 < heads:
            s_next = qk(h + 1)
        vh = v[:, h * d:(h + 1) * d]
        if mode == "matmul":   # skip softmax entirely
            e = s.astype(vh.dtype)
            z = jnp.float32(1.0)
        elif mode == "bf16sm":  # whole softmax pipeline in bf16
            if mask is not None:
                s = jnp.where(mask, s, -jnp.inf)
            sb = s.astype(jnp.bfloat16)
            m = jnp.max(sb, axis=-1, keepdims=True)
            e = jnp.exp(sb - m)
            z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        elif mode == "exp2":    # scale folded into qk, exp2 instead of exp
            if mask is not None:
                s = jnp.where(mask, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp2((s - m).astype(jnp.bfloat16) * jnp.bfloat16(1.4426950408889634))
            z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        else:
            if mask is not None:
                s = jnp.where(mask, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            if exp_dtype == "bf16":
                e = jnp.exp((s - m).astype(jnp.bfloat16))
            else:
                e = jnp.exp(s - m)
            z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, h * d:(h + 1) * d] = (o / z).astype(o_ref.dtype)


def attn(qkv, block_q=704, g_heads=4, mode="full", exp_dtype="bf16",
         np_len=NP):
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // H
    gw = g_heads * d
    n_groups = hd // gw
    pad = np_len - n
    if pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, pad), (0, 0)))
    n_q = np_len // block_q
    kfn = functools.partial(kernel, scale=d ** -0.5, valid_len=n,
                            heads=g_heads, mode=mode, exp_dtype=exp_dtype)
    return pl.pallas_call(
        kfn,
        grid=(b, n_groups, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, gw), lambda b_, g, i: (b_, i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_len, gw),
                         lambda b_, g, i, ng=n_groups: (b_, 0, ng + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_len, gw),
                         lambda b_, g, i, ng=n_groups: (b_, 0, 2 * ng + g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, gw), lambda b_, g, i: (b_, i, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_len, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * n * hd,
            bytes_accessed=4 * b * n * hd * qkv.dtype.itemsize,
            transcendentals=b * n * n * H,
        ),
    )(qkv, qkv, qkv)


def sync(r):
    return np.asarray(r)


def slope(fn, xs, k_small=4, k_large=12, reps=7):
    f_s = jax.jit(lambda xs: jnp.stack([fn(x)[0, :1, :1] for x in xs[:k_small]]))
    f_l = jax.jit(lambda xs: jnp.stack([fn(x)[0, :1, :1] for x in xs[:k_large]]))
    for f in (f_s, f_l):
        sync(f(xs))
        sync(f(xs))

    def med(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(xs))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    return (med(f_l) - med(f_s)) / (k_large - k_small)


def main():
    variants = sys.argv[1:] or [
        "full", "matmul", "nomask", "fp32exp",
        "bq352", "bq176", "g8", "g2",
    ]
    keys = jax.random.split(jax.random.PRNGKey(0), 12)
    # UNPADDED inputs: attn() pads to np_len with valid_len=N, so the kernel
    # builds and applies the pad-key mask exactly like the production path
    # (generating at NP made valid_len==nb, the mask never built, and the
    # 'nomask' ablation identical to 'full')
    xs = [jax.random.normal(k, (B, N, 3 * H * D), jnp.bfloat16) for k in keys]

    specs = {
        "full": dict(),
        "matmul": dict(mode="matmul"),
        "nomask": dict(mode="nomask"),
        "fp32exp": dict(exp_dtype="fp32"),
        "bq352": dict(block_q=352),
        "bq176": dict(block_q=176),
        "g8": dict(g_heads=8, block_q=352),
        "g2": dict(g_heads=2, block_q=704),
        "g2bq1408": dict(g_heads=2, block_q=1408),
        "bf16sm352": dict(mode="bf16sm", block_q=352),
        "exp2_352": dict(mode="exp2", block_q=352),
        "mm352": dict(mode="matmul", block_q=352),
        "bq448": dict(block_q=448, np_len=1792),
        "g8bq176": dict(g_heads=8, block_q=176),
        "g8bq704": dict(g_heads=8, block_q=704),
        "g8mm": dict(g_heads=8, block_q=352, mode="matmul"),
    }
    for name in variants:
        kw = specs[name]
        fn = functools.partial(attn, **kw)
        try:
            dt = slope(fn, xs)
            print(f"{name:>10}: {dt*1e3:7.3f} ms  {FLOPS/dt/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"{name:>10}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
