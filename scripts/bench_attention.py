#!/usr/bin/env python
"""Micro-benchmark for the encoder attention kernel on the real chip.

Times flash_attention_qkv (and variants) at the vitl window shape
(B=32, N=1370, H=16, D=64) and prints achieved TF/s against the
4*B*N^2*H*D flop count the ROADMAP budget uses.

Usage: python scripts/bench_attention.py [--blocks 704,352] [--reps 5]
Axon tunnel rules (CLAUDE.md): chain calls inside one jit, sync by
fetching a tiny slice.
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from vda_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


B, N, H, D = 32, 1370, 16, 64
FLOPS = 4 * B * N * N * H * D  # QK + AV


def sync(r):
    return np.asarray(r[..., :1, :1])


def time_fn(fn, xs, reps=5):
    """xs: list of distinct inputs (prevents CSE); returns s/call."""
    chain = len(xs)

    @jax.jit
    def run(xs):
        return jnp.stack([fn(x)[0, :1, :1] for x in xs])

    sync(run(xs))
    sync(run(xs))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = run(xs)
        sync(o)
        ts.append((time.perf_counter() - t0) / chain)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--impls", type=str, default="qkv")
    args = ap.parse_args()

    keys = jax.random.split(jax.random.PRNGKey(0), args.chain)
    xs = [jax.random.normal(k, (B, N, 3 * H * D), jnp.bfloat16) for k in keys]

    from vda_tpu.ops import pallas_attention as pa

    results = {}
    for name in args.impls.split(","):
        if name == "qkv":
            wrapped = functools.partial(pa.flash_attention_qkv, heads=H,
                                        scale=D ** -0.5)
        elif name.startswith("qkv@"):  # qkv@BLOCKQ
            bq = int(name.split("@")[1])
            wrapped = functools.partial(pa.flash_attention_qkv, heads=H,
                                        scale=D ** -0.5, block_q=bq)
        elif name == "xla":
            def wrapped(x):
                q, k, v = jnp.split(x, 3, axis=-1)
                qh = q.reshape(B, N, H, D)
                kh = k.reshape(B, N, H, D)
                vh = v.reshape(B, N, H, D)
                logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                                    preferred_element_type=jnp.float32)
                p = jax.nn.softmax(logits * D ** -0.5, -1).astype(x.dtype)
                return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, N, H * D)
        else:
            print(f"unknown impl {name}")
            continue
        dt = time_fn(wrapped, xs, reps=args.reps)
        tfs = FLOPS / dt / 1e12
        results[name] = (dt * 1e3, tfs)
        print(f"{name:>12}: {dt * 1e3:7.2f} ms  {tfs:6.1f} TF/s")

    return results


if __name__ == "__main__":
    main()
