"""On-chip trainer throughput characterization (VERDICT r4 #5).

Times the REAL jitted train step (vda_tpu/parallel/trainer.make_train_step)
at a chip-filling shape with the metrics fetch amortized OUT of the timed
loop: steps are chained on device (each depends on the previous state) and
only the final loss is fetched, so the measured wall time is device compute,
not per-step host syncs.  Records ms/step, frames/s, and the HBM high-water
mark from device memory_stats when the backend exposes it.

    timeout 1200 python scripts/train_throughput.py \
        --encoder vitl --batch 1 --frames 8 --size 518 --steps 10

Find the chip-filling shape by raising --frames/--batch until the compile
reports RESOURCE_EXHAUSTED (the error is loud, the script exits cleanly).
"""
import argparse
import json
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
from vda_tpu.parallel.mesh import make_mesh
from vda_tpu.parallel.train import (init_train_state, make_optimizer,
                                    make_train_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="vitl")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    cfg = get_config(args.encoder)
    mesh = make_mesh(tp=1)
    params = init_video_depth_anything(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-5)
    state = init_train_state(params, optimizer)
    step_fn = jax.jit(make_train_step(cfg, optimizer))

    b, t, s = args.batch, args.frames, args.size
    key = jax.random.PRNGKey(1)
    batch = {
        "video": jax.random.uniform(key, (b, t, s, s, 3), jnp.float32),
        "depth": jnp.ones((b, t, s, s), jnp.float32) * 2.0,
        "mask": jnp.ones((b, t, s, s), jnp.float32),
    }

    dev = jax.devices()[0]
    with jax.set_mesh(mesh):
        t0 = time.perf_counter()
        try:
            state, metrics = step_fn(state, batch)
            float(metrics["total_loss"])  # sync the compile+first step
        except Exception as e:  # noqa: BLE001 — report OOM shape cleanly
            print(json.dumps({"shape": [b, t, s], "error":
                              f"{type(e).__name__}: {str(e)[:300]}"}))
            return 1
        compile_s = time.perf_counter() - t0

        # timed: chained steps, one terminal fetch
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step_fn(state, batch)
        final = float(metrics["total_loss"])
        dt = time.perf_counter() - t0

    ms = dt * 1000.0 / args.steps
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:  # noqa: BLE001 — axon may not expose memory_stats
        pass
    out = {
        "encoder": args.encoder,
        "shape_bts": [b, t, s],
        "steps": args.steps,
        "ms_per_step": round(ms, 1),
        "frames_per_s": round(b * t * 1000.0 / ms, 2),
        "compile_plus_first_s": round(compile_s, 1),
        "final_loss": round(final, 4),
        "hbm_peak_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
        if stats else None,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
