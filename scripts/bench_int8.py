#!/usr/bin/env python
"""Does int8 dot_general actually hit the v5e's 2x MXU path?

Measures the encoder's big matmul shape (qkv: 45056x1024 @ 1024x3072) in
bf16 vs int8 (with and without the dynamic activation-quantization overhead).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from vda_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def sync(r):
    return np.asarray(r[..., :1])


def slope(make, args, lo=2, hi=8, reps=3):
    out = {}
    for name, k in (("lo", lo), ("hi", hi)):
        f = jax.jit(make(k))
        sync(f(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(*args))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        out[name] = ts[len(ts) // 2]
    return (out["hi"] - out["lo"]) / (hi - lo) * 1e3


def main():
    m, k, n = 45056, 1024, 3072
    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (m, k), jnp.bfloat16)
    wb = jax.random.normal(key, (k, n), jnp.bfloat16)
    xi = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
    wi = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
    sw = jnp.ones((n,), jnp.float32)
    flops = 2 * m * k * n

    def mk_bf16(reps):
        def f(x, w):
            acc = x
            for _ in range(reps):
                y = jnp.matmul(acc, w)
                acc = acc + y[:, :k] * 1e-6
            return acc[:1, :1]
        return f

    ms = slope(mk_bf16, (xb, wb))
    print(f"bf16 matmul: {ms:.3f} ms  {flops/ms/1e9:.1f} TF/s", flush=True)

    def mk_int8(reps):
        def f(x, w):
            y32 = None
            for i in range(reps):
                y32 = jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                x = jnp.clip(x + y32[:, :k].astype(jnp.int8) // 127, -127, 127)
            return y32[:1, :1]
        return f

    ms = slope(mk_int8, (xi, wi))
    print(f"int8 matmul (pre-quantized): {ms:.3f} ms  {flops/ms/1e9:.1f} TOP/s",
          flush=True)

    def mk_dynq(reps):
        def f(x, w):
            out = None
            for _ in range(reps):
                s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                            keepdims=True) / 127.0
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                              127).astype(jnp.int8)
                y32 = jax.lax.dot_general(
                    xq, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out = y32.astype(jnp.float32) * s * sw[None, :]
                x = x + out[:, :k].astype(x.dtype) * 1e-6
            return out[:1, :1]
        return f

    ms = slope(mk_dynq, (xb, wi))
    print(f"int8 + dynamic act quant + dequant: {ms:.3f} ms  "
          f"{flops/ms/1e9:.1f} TF/s-equiv", flush=True)


if __name__ == "__main__":
    main()
