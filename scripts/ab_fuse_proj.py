"""Same-process A/B of the fused attention+out-projection block kernel
(VDA_ATTN_FUSE_PROJ, VERDICT r4 #7) in the full vitl window.

The flag is read at trace time inside block_apply, so two jit wrappers traced
under each setting give fused and split executables; interleaved timing
removes tunnel/session drift.  Compile-test the novel kernel structure at a
tiny shape FIRST (scripts/compile_fuse_proj.py) — a pathological Mosaic
kernel can hang the remote compile and wedge the tunnel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vda_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from vda_tpu.config import get_config
from vda_tpu.models import init_video_depth_anything
from vda_tpu.models.vda import forward
from vda_tpu.utils.convert import cast_params_for_inference


def sync(r):
    return np.asarray(r[..., :1, :1])


def main():
    cfg = get_config("vitl")
    params = cast_params_for_inference(
        init_video_depth_anything(jax.random.PRNGKey(0), cfg))
    x = jnp.ones((1, 32, 518, 518, 3), jnp.bfloat16)

    steps = {}
    outs = {}
    for name, flag in (("fused", "1"), ("split", "0")):
        os.environ["VDA_ATTN_FUSE_PROJ"] = flag

        @jax.jit
        def step(params, x):
            return forward(params, x, cfg, attn_impl="auto",
                           micro_batch_size=32)

        out = step(params, x)
        outs[name] = np.asarray(out, np.float32)
        steps[name] = step

    diff = np.max(np.abs(outs["fused"] - outs["split"]))
    ref = max(np.max(np.abs(outs["split"])), 1e-6)
    print(f"max_abs_diff {diff:.3e}  max_rel {diff / ref:.3e}", flush=True)

    chain, reps = 4, 7
    res = {k: [] for k in steps}
    for _ in range(reps):
        for name, step in steps.items():
            sync(step(params, x))  # drain
            t0 = time.perf_counter()
            out = None
            for _ in range(chain):
                out = step(params, x)
            sync(out)
            res[name].append((time.perf_counter() - t0) / chain * 1e3)
    for name, ts in res.items():
        ts.sort()
        print(f"{name}: p50 {ts[len(ts)//2]:.1f} ms  min {ts[0]:.1f} "
              f"all {[round(t,1) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
