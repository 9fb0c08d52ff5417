"""Same-process interleaved A/B: fused cached-head attention over the
assembled streaming context (StreamingDepth(ctx_kernel=True), VERDICT r4 #9)
vs the stock XLA concat+attention path.

Both arms share weights and the default cache dtype; alternating measurement
blocks cancel tunnel/session drift (the method that settled the int8
contradiction in r4).  Numerics are cross-checked on the last depth frame.

    timeout 1200 python scripts/ab_ctx_kernel.py [--encoder vitl]
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
from vda_tpu.infer import StreamingDepth
from vda_tpu.models import init_video_depth_anything
from vda_tpu.utils.convert import cast_params_for_inference


def main():
    encoder = "vitl"
    if "--encoder" in sys.argv:
        encoder = sys.argv[sys.argv.index("--encoder") + 1]
    size = 518
    cfg = get_config(encoder)
    params = cast_params_for_inference(
        init_video_depth_anything(jax.random.PRNGKey(0), cfg))
    frame = jnp.asarray(np.full((size, size, 3), 128, np.uint8))

    arms = {
        "xla_ctx": StreamingDepth(params, cfg, input_size=size,
                                  ctx_kernel=False),
        "ctx_kernel": StreamingDepth(params, cfg, input_size=size,
                                     ctx_kernel=True),
    }
    print(f"cache_dtype={arms['xla_ctx'].cache_dtype}", flush=True)

    def measure_block(s, n):
        dd = None
        t0 = time.perf_counter()
        for _ in range(n):
            dd = s.submit(frame)
        np.asarray(dd[:1, :1])
        return (time.perf_counter() - t0) * 1000.0 / n, dd

    # warmup past the eviction threshold (steady-state bookkeeping)
    last = {}
    for name, s in arms.items():
        t0 = time.perf_counter()
        for _ in range(44):
            d = s.submit(frame)
        last[name] = np.asarray(d, np.float32)
        print(f"{name}: warmup+compile {time.perf_counter()-t0:.1f}s",
              flush=True)

    diff = np.max(np.abs(last["ctx_kernel"] - last["xla_ctx"]))
    ref = max(np.max(np.abs(last["xla_ctx"])), 1e-6)
    print(f"max_abs_diff {diff:.3e}  max_rel {diff/ref:.3e}", flush=True)

    res = {k: [] for k in arms}
    for _ in range(5):
        for name, s in arms.items():
            res[name].append(measure_block(s, 16)[0])
    for name, ts in res.items():
        ts.sort()
        print(f"{name}: p50 {ts[len(ts)//2]:.2f} ms/frame  min {ts[0]:.2f} "
              f"all {[round(t,2) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
