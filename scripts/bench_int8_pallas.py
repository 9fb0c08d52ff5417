#!/usr/bin/env python
"""Does an int8 dot INSIDE a Pallas kernel hit the v5e 2x int8 MXU path?

XLA's int8 dot_general measured exactly the bf16 rate (scripts/bench_int8.py)
— this checks whether Mosaic does better at the encoder qkv shape.
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

M, K, N = 45056, 1024, 3072
BM, BN = 512, 1024


def kernel(x_ref, w_ref, o_ref, *, acc_dtype):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype).astype(o_ref.dtype)


def matmul(x, w, out_dtype, acc_dtype):
    return pl.pallas_call(
        functools.partial(kernel, acc_dtype=acc_dtype),
        grid=(M // BM, N // BN),
        in_specs=[
            pl.BlockSpec((BM, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )(x, w)


def sync(r):
    return np.asarray(r[:1, :1])


def slope(f, args, lo=2, hi=8, reps=3):
    out = {}
    for name, k in (("lo", lo), ("hi", hi)):
        @jax.jit
        def g(x, w, k=k):
            o = None
            for i in range(k):
                o = f(x, w)
                # chain iterations through a REAL (cheap, non-foldable)
                # dependency so XLA cannot CSE the matmuls
                if w.dtype == jnp.int8:
                    w = jnp.clip(w + (o[:1, :N:N // K] if N >= K else
                                      o[:1, :K]).reshape(1, -1)[:, :1]
                                 .astype(jnp.int8) % 2, -127, 127)
                else:
                    w = w + o[0, 0].astype(w.dtype) * 1e-12
            return o
        sync(g(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(g(*args))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        out[name] = ts[len(ts) // 2]
    return (out["hi"] - out["lo"]) / (hi - lo) * 1e3


def main():
    key = jax.random.PRNGKey(0)
    flops = 2 * M * K * N

    xb = jax.random.normal(key, (M, K), jnp.bfloat16)
    wb = jax.random.normal(key, (K, N), jnp.bfloat16)
    ms = slope(lambda x, w: matmul(x, w, jnp.bfloat16, jnp.float32), (xb, wb))
    print(f"pallas bf16: {ms:.3f} ms  {flops/ms/1e9:.1f} TF/s", flush=True)

    xi = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    wi = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    ms = slope(lambda x, w: matmul(x, w, jnp.int32, jnp.int32), (xi, wi))
    print(f"pallas int8->int32: {ms:.3f} ms  {flops/ms/1e9:.1f} TOP/s",
          flush=True)


if __name__ == "__main__":
    main()
