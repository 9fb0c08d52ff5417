#!/usr/bin/env python
"""Per-stage perf budget of the DPT temporal head (vitl window shape).

Slope method: time K=lo vs K=hi in-graph repetitions and divide the delta —
this cancels the ~26 ms fixed dispatch/sync overhead of the axon tunnel.
Stages are feedback-chained (output folded into the next input) so XLA can't
CSE or dead-code them.

    python scripts/bench_head.py mm        # 4 temporal modules
    python scripts/bench_head.py tail      # refinenet2/1 + output convs
    python scripts/bench_head.py pyramid   # projects/resize/scratch/rf4/rf3
    python scripts/bench_head.py head      # whole head
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
    return np.asarray(jax.tree_util.tree_leaves(r)[0])


def slope(make_fn, params, x, lo=2, hi=6, reps=3):
    """ms per iteration via (t_hi - t_lo) / (hi - lo)."""
    f_lo = jax.jit(make_fn(lo))
    f_hi = jax.jit(make_fn(hi))
    out = {}
    for name, f in (("lo", f_lo), ("hi", f_hi)):
        sync(f(params, x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(params, x))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        out[name] = ts[len(ts) // 2]
    return (out["hi"] - out["lo"]) / (hi - lo) * 1e3


def main():
    stages = sys.argv[1:] or ["mm"]
    from vda_tpu.config import get_config
    from vda_tpu.models import dpt
    from vda_tpu.models.temporal import temporal_module_apply
    from vda_tpu.utils.convert import cast_params_for_inference

    cfg = get_config("vitl")
    key = jax.random.PRNGKey(0)
    p = jax.tree_util.tree_map(
        lambda x: x, dpt.init_dpt_head(key, cfg, temporal=True))
    p = cast_params_for_inference({"head": p})["head"]

    if "mm" in stages:
        shapes = [  # (module index, B,T,H,W,C)
            (0, (1, 32, 37, 37, 1024)),
            (1, (1, 32, 19, 19, 1024)),
            (2, (1, 32, 37, 37, 256)),
            (3, (1, 32, 74, 74, 256)),
        ]
        for mi, shp in shapes:
            x = jax.random.normal(key, shp, jnp.bfloat16)
            pm = p["motion_modules"][mi]

            def make(k, pm=pm):
                def f(pm, x):
                    for _ in range(k):
                        x, _ = temporal_module_apply(pm, x, cfg, None)
                    return x[0, 0, :1, :1, :1]
                return f

            ms = slope(make, pm, x)
            print(f"mm{mi} {shp}: {ms:.2f} ms", flush=True)

    if "tail" in stages:
        path3 = jax.random.normal(key, (32, 74, 74, 256), jnp.bfloat16)
        l2 = jax.random.normal(key, (32, 74, 74, 256), jnp.bfloat16)
        l1 = jax.random.normal(key, (32, 148, 148, 256), jnp.bfloat16)

        for mb in (16,):
            def make(k, mb=mb):
                def f(p, args):
                    p3, x2, x1 = args
                    for _ in range(k):
                        nc = 32 // mb

                        def chunk(t):
                            return t.reshape(nc, mb, *t.shape[1:])

                        def body(_, xs):
                            a, b, c = xs
                            return None, dpt._output_tail(p, a, b, c, (518, 518))

                        _, d = jax.lax.scan(
                            body, None, (chunk(p3), chunk(x2), chunk(x1)))
                        p3 = p3 + d.reshape(32, 518, 518, 1)[0, 0, 0, 0] * 1e-12
                    return p3[0, :1, :1, :1]
                return f

            ms = slope(make, p, (path3, l2, l1))
            print(f"output tail (rf2/rf1/convs, mb={mb}): {ms:.2f} ms", flush=True)

    if "pyramid" in stages:
        toks = [jax.random.normal(key, (32, 1369, 1024), jnp.bfloat16)
                for _ in range(4)]
        feats = [(t, None) for t in toks]

        def make(k):
            def f(p, toks):
                feats = [(t, None) for t in toks]
                for _ in range(k):
                    l1, l2, l3, l4 = dpt._project_and_resize(p, feats, (37, 37))
                    r1 = dpt.conv2d(p["scratch"]["layer1_rn"], l1, padding=1)
                    r2 = dpt.conv2d(p["scratch"]["layer2_rn"], l2, padding=1)
                    r3 = dpt.conv2d(p["scratch"]["layer3_rn"], l3, padding=1)
                    r4 = dpt.conv2d(p["scratch"]["layer4_rn"], l4, padding=1)
                    p4 = dpt._fusion(p["refinenet4"], r4, size=r3.shape[1:3])
                    p3 = dpt._fusion(p["refinenet3"], p4, r3, size=r2.shape[1:3])
                    fb = p3[0, 0, 0, 0] * 1e-12
                    toks = [t + fb for t in toks]
                return toks[0][0, :1, :1]
            return f

        ms = slope(make, p, toks)
        print(f"pyramid (proj/resize/scratch/rf4/rf3): {ms:.2f} ms", flush=True)

    if "head" in stages:
        toks = [jax.random.normal(key, (32, 1369, 1024), jnp.bfloat16)
                for _ in range(4)]

        def make(k):
            def f(p, toks):
                for _ in range(k):
                    feats = [(t, None) for t in toks]
                    d, _ = dpt.dpt_head_temporal_apply(
                        p, feats, (37, 37), 32, cfg, None, 16)
                    fb = d[0, 0, 0, 0] * 1e-12
                    toks = [t + fb.astype(t.dtype) for t in toks]
                return toks[0][0, :1, :1]
            return f

        ms = slope(make, p, toks)
        print(f"full head (mb=16): {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
