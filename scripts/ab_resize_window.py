"""Same-process A/B of the fused Pallas resize in the full vitl window.

VDA_RESIZE_KERNEL is read at trace time, so two separate jit wrappers traced
under each setting give kernel-on and kernel-off executables; interleaved
timing removes tunnel/session drift from the comparison.
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
    for name, flag in (("pallas", "1"), ("xla", "0")):
        os.environ["VDA_RESIZE_KERNEL"] = flag

        @jax.jit
        def step(params, x):
            return forward(params, x, cfg, attn_impl="auto",
                           micro_batch_size=32)

        sync(step(params, x))  # compile under this trace-time flag
        steps[name] = step

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
