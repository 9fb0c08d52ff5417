#!/usr/bin/env python
"""Same-process interleaved A/B: default one-hot streaming vs the sliding
append-only layout (streaming_experimental.SlidingStreamingDepth).

The r3 ladder lesson (CLAUDE.md): always A/B against the PREVIOUS DEFAULT in
one session, alternating measurement blocks so session drift cancels.

    python scripts/ab_stream_slide.py [--size 518] [--rows 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="vitl")
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--rows", type=int, default=128)
    ap.add_argument("--warm", type=int, default=44)
    ap.add_argument("--block", type=int, default=16)
    ap.add_argument("--blocks", type=int, default=4)
    args = ap.parse_args()
    os.environ["VDA_STREAM_SLIDE_ROWS"] = str(args.rows)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vda_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from vda_tpu.config import get_config
    from vda_tpu.models import init_video_depth_anything
    from vda_tpu.utils.convert import cast_params_for_inference
    from vda_tpu.infer import StreamingDepth
    from vda_tpu.infer.streaming_experimental import SlidingStreamingDepth

    cfg = get_config(args.encoder)
    params = cast_params_for_inference(
        init_video_depth_anything(jax.random.PRNGKey(0), cfg))
    frame = jnp.asarray(np.full((args.size, args.size, 3), 128, np.uint8))

    def warm(s):
        for _ in range(args.warm):
            d = s.submit(frame)
        np.asarray(d[:1, :1])
        return d

    def block(s):
        t0 = time.perf_counter()
        for _ in range(args.block):
            d = s.submit(frame)
        np.asarray(d[:1, :1])
        return (time.perf_counter() - t0) * 1000.0 / args.block

    a = StreamingDepth(params, cfg, input_size=args.size)
    b = SlidingStreamingDepth(params, cfg, input_size=args.size)
    print("warmup A (default)...", flush=True)
    da = warm(a)
    print("warmup B (slide)...", flush=True)
    db = warm(b)
    diff = float(np.abs(np.asarray(da) - np.asarray(db)).max())
    print(f"warmup depth max-abs-diff: {diff:.3e}", flush=True)

    ta, tb = [], []
    for i in range(args.blocks):
        ta.append(block(a))
        tb.append(block(b))
        print(f"block {i}: default {ta[-1]:.2f} ms/frame, "
              f"slide {tb[-1]:.2f} ms/frame", flush=True)
    ta.sort()
    tb.sort()
    pa, pb = ta[len(ta) // 2], tb[len(tb) // 2]
    print(f"p50 default={pa:.2f} slide={pb:.2f} ms/frame "
          f"(delta {pb - pa:+.2f})", flush=True)


if __name__ == "__main__":
    main()
