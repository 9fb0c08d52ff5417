#!/usr/bin/env python
"""Island-resize formulation shootout (vitl tail shape: 296^2 -> 518^2, 128ch).

The fp32-island resize is ~21 ms of the 354 ms vitl window (CLAUDE.md perf
log) and the dense separable matmul form runs at only ~49 TF/s.  This bench
slope-measures isolated variants to find a faster formulation before trying
a Pallas kernel.  Usage:

    python scripts/bench_resize.py [variant ...]   # default: all
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from vda_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import os

B = int(os.environ.get("RB_B", "32"))
H = int(os.environ.get("RB_H", "296"))
W = int(os.environ.get("RB_W", str(H)))
C = int(os.environ.get("RB_C", "128"))
OH = int(os.environ.get("RB_OH", "518"))
OW = int(os.environ.get("RB_OW", str(OH)))


def sync(r):
    return np.asarray(jax.tree_util.tree_leaves(r)[0])


def slope(f, args, lo=2, hi=6, reps=5):
    def chain(k):
        @jax.jit
        def g(x, *rest):
            for _ in range(k):
                y = f(x, *rest)
                x = x + y[:, :1, :1, :].mean(axis=(1, 2, 3), keepdims=True)[
                    ..., :1].astype(x.dtype) * 1e-12
            return y[0, :1, :1, 0]
        return g

    fl, fh = chain(lo), chain(hi)
    out = {}
    for name, fn in (("lo", fl), ("hi", fh)):
        sync(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*args))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        out[name] = ts[len(ts) // 2]
    return (out["hi"] - out["lo"]) / (hi - lo) * 1e3


def main():
    from vda_tpu.ops.resize import _linear_matrix

    want = sys.argv[1:] or ["base", "tlast", "wfirst", "padk", "fused1d",
                            "pallas"]
    x = jnp.ones((B, H, W, C), jnp.bfloat16)
    ah = jnp.asarray(_linear_matrix(H, OH, True)).astype(jnp.bfloat16)
    aw = jnp.asarray(_linear_matrix(W, OW, True)).astype(jnp.bfloat16)

    if "base" in want:
        def base(x, ah, aw):
            y = jnp.einsum("oh,bhwc->bowc", ah, x,
                           preferred_element_type=jnp.float32)
            y = jnp.einsum("pw,bowc->bopc", aw, y.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)
        print(f"base (H then W, einsum): {slope(base, (x, ah, aw)):.2f} ms",
              flush=True)

    if "tlast" in want:
        # keep the contraction dim minor on the data operand both passes:
        # (b,h,w,c) -> (b,w,c,h) @ (h,o) -> (b,w,c,o) -> ... -> transpose back
        def tlast(x, ah, aw):
            xt = x.transpose(0, 2, 3, 1)                      # (b, w, c, h)
            y = jnp.einsum("bwch,oh->bwco", xt, ah,
                           preferred_element_type=jnp.float32)
            y = y.astype(jnp.bfloat16).transpose(0, 3, 2, 1)  # (b, o, c, w)
            z = jnp.einsum("bocw,pw->bocp", y, aw,
                           preferred_element_type=jnp.float32)
            return z.astype(jnp.bfloat16).transpose(0, 1, 3, 2)
        print(f"tlast (contraction-minor + transposes): "
              f"{slope(tlast, (x, ah, aw)):.2f} ms", flush=True)

    if "wfirst" in want:
        def wfirst(x, ah, aw):
            y = jnp.einsum("pw,bhwc->bhpc", aw, x,
                           preferred_element_type=jnp.float32)
            y = jnp.einsum("oh,bhpc->bopc", ah, y.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)
        print(f"wfirst (W then H): {slope(wfirst, (x, ah, aw)):.2f} ms",
              flush=True)

    if "padk" in want:
        # pad the 296 contraction dim to 384 (mult of 128)
        ahp = jnp.pad(ah, ((0, 0), (0, 384 - H)))
        awp = jnp.pad(aw, ((0, 0), (0, 384 - W)))

        def padk(x, ahp, awp):
            xp = jnp.pad(x, ((0, 0), (0, 384 - H), (0, 0), (0, 0)))
            y = jnp.einsum("oh,bhwc->bowc", ahp, xp,
                           preferred_element_type=jnp.float32)
            yp = jnp.pad(y.astype(jnp.bfloat16),
                         ((0, 0), (0, 0), (0, 384 - W), (0, 0)))
            z = jnp.einsum("pw,bowc->bopc", awp, yp,
                           preferred_element_type=jnp.float32)
            return z.astype(jnp.bfloat16)
        print(f"padk (K 296->384): {slope(padk, (x, ahp, awp)):.2f} ms",
              flush=True)

    if "pallas" in want:
        from vda_tpu.ops.pallas_resize import (
            resize_bilinear_fused,
            supported,
        )

        assert supported(x, (OH, OW), True, None)

        def pallas(x):
            return resize_bilinear_fused(x, (OH, OW))
        print(f"pallas (fused H-lerp + in-VMEM W matmul): "
              f"{slope(pallas, (x,)):.2f} ms", flush=True)

    if "fused1d" in want:
        # one einsum, both axes at once (XLA picks the schedule)
        def fused1d(x, ah, aw):
            y = jnp.einsum("oh,pw,bhwc->bopc", ah, aw, x,
                           preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)
        print(f"fused1d (single 3-operand einsum): "
              f"{slope(fused1d, (x, ah, aw)):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
