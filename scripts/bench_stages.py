#!/usr/bin/env python
"""Per-stage perf budget on the real chip (vitl window shape).

Each stage is chained in-graph and synced with a tiny fetch (axon rules).
Run one stage at a time to bound compile latency:
    python scripts/bench_stages.py block noattn ln
    python scripts/bench_stages.py full encoder
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
    return np.asarray(r)


def timeit(f, x, reps=5):
    sync(f(x))
    sync(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    stages = sys.argv[1:] or ["block", "noattn", "ln"]
    key = jax.random.PRNGKey(0)
    from vda_tpu.config import get_config
    from vda_tpu.models import dinov2
    from vda_tpu.ops.layers import gelu, layer_norm, linear

    cfg = get_config("vitl")
    ecfg = cfg.vit
    bp = dinov2.init_block(key, ecfg)
    x1 = jax.random.normal(key, (32, 1370, 1024), jnp.bfloat16)

    if "block" in stages:
        @jax.jit
        def blkchain(x):
            for _ in range(8):
                x = dinov2.block_apply(bp, x, ecfg, "auto")
            return x[0, :1, :1]
        dt = timeit(blkchain, x1) / 8
        print(f"encoder block: {dt*1e3:.3f} ms  x24 = {dt*24*1e3:.1f} ms", flush=True)

    if "noattn" in stages:
        @jax.jit
        def blknoattn(x):
            for _ in range(8):
                h = layer_norm(bp["norm1"], x)
                qkv = linear(bp["attn"]["qkv"], h)
                o = qkv[..., :1024]
                h = linear(bp["attn"]["proj"], o)
                x = x + h * bp["ls1"].astype(h.dtype)
                h = linear(bp["mlp"]["fc2"],
                           gelu(linear(bp["mlp"]["fc1"],
                                       layer_norm(bp["norm2"], x))))
                x = x + h * bp["ls2"].astype(h.dtype)
            return x[0, :1, :1]
        dt = timeit(blknoattn, x1) / 8
        print(f"block minus attention: {dt*1e3:.3f} ms  x24 = {dt*24*1e3:.1f} ms", flush=True)

    if "ln" in stages:
        @jax.jit
        def lnchain(x):
            for _ in range(16):
                x = layer_norm(bp["norm1"], x).astype(x.dtype)
            return x[0, :1, :1]
        dt = timeit(lnchain, x1) / 16
        print(f"layer_norm (32,1370,1024): {dt*1e3:.3f} ms  x48 = {dt*48*1e3:.1f} ms", flush=True)

    if "full" in stages or "encoder" in stages:
        from vda_tpu.models import init_video_depth_anything
        from vda_tpu.models.vda import forward
        from vda_tpu.utils.convert import cast_params_for_inference
        params = init_video_depth_anything(jax.random.PRNGKey(0), cfg)
        params = cast_params_for_inference(params)
        x = jnp.ones((1, 32, 518, 518, 3), jnp.bfloat16)

        if "full" in stages:
            @jax.jit
            def full(x):
                return forward(params, x, cfg, attn_impl="auto",
                               micro_batch_size=16)
            dt4 = timeit(full, x)
            print(f"full window: {dt4*1e3:.1f} ms", flush=True)

        if "encoder" in stages:
            @jax.jit
            def enc_only(x):
                bt = x.reshape(32, 518, 518, 3)
                feats = dinov2.encode(params["pretrained"], bt, ecfg,
                                      cfg.intermediate_layer_idx, "auto")
                return feats[-1][0][0, :1, :1]
            dt5 = timeit(enc_only, x)
            print(f"encoder only: {dt5*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
