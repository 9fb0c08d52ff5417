"""Probe axon per-dispatch overhead vs argument count/size.

Hypothesis from streaming profiling: the ~10 ms gap between the in-graph
step cost (10.09 ms) and the e2e per-step cost (19.95 ms) is per-argument
dispatch overhead through the dev tunnel (~300 param leaves per call).
"""
import time

import jax
import jax.numpy as jnp


def sync(x):
    jax.device_get(jnp.ravel(x)[:1])


def time_calls(f, args, n=30):
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # n_args small arrays, plus one real workload matmul to have compute
    for n_args in (1, 30, 100, 300):
        arrays = [jnp.ones((64, 64), jnp.bfloat16) for _ in range(n_args)]
        arrays = jax.device_put(arrays, dev)

        @jax.jit
        def f(xs):
            return xs[0] + 1.0

        ms = time_calls(f, (arrays,))
        print(f"n_args={n_args:4d} small:   {ms:7.2f} ms/call", flush=True)

    # same but with realistic param sizes (1024x1024 bf16 = 2 MB each)
    for n_args in (30, 150, 300):
        arrays = [jnp.ones((1024, 1024), jnp.bfloat16) for _ in range(n_args)]
        arrays = jax.device_put(arrays, dev)

        @jax.jit
        def f(xs):
            return xs[0][0, 0] + 1.0

        ms = time_calls(f, (arrays,))
        print(f"n_args={n_args:4d} 2MB:     {ms:7.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
