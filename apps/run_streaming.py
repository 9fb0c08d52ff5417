#!/usr/bin/env python
"""Streaming (causal, frame-by-frame) video depth CLI — rebuild of reference
run_streaming.py:25-96.  Reads frames with cv2, calls the streaming estimator
per frame, writes the depth visualization video, prints wall time."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Video Depth Anything streaming (TPU)")
    parser.add_argument("--input_video", type=str,
                        default="./assets/example_videos/davis_rollercoaster.mp4")
    parser.add_argument("--output_dir", type=str, default="./outputs")
    parser.add_argument("--input_size", type=int, default=518)
    parser.add_argument("--max_res", type=int, default=1280)
    parser.add_argument("--encoder", type=str, default="vitl",
                        choices=["vits", "vitb", "vitl", "vitg", "tiny"])
    parser.add_argument("--max_len", type=int, default=-1)
    parser.add_argument("--target_fps", type=int, default=-1)
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--grayscale", action="store_true")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--attn-impl", type=str, default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--lookahead", type=int, default=1,
                        help="frames per dispatch (>1 = throughput mode: "
                             "batched encoder, identical outputs, up to "
                             "<lookahead> frames of added latency)")
    parser.add_argument("--cache-dtype", type=str, default="auto",
                        choices=["auto", "bf16", "int8"],
                        help="hidden-state cache dtype: int8 (the default "
                             "via auto) halves the cache and its per-step "
                             "read; bf16 is the lossless fallback "
                             "(infer/streaming._DEFAULT_CACHE_DTYPE)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree on a multi-chip host: "
                             "shard the per-frame network + kv cache over a "
                             "('data','model') mesh for latency "
                             "(infer/streaming.py StreamingDepth(mesh=...))")
    return parser


def main(argv=None):
    args = build_arg_parser().parse_args(argv)

    import cv2

    from vda_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # vitl compiles are minutes; cache across runs

    from apps.run import load_model
    from vda_tpu.infer import StreamingDepth
    from vda_tpu.utils.io import ensure_even, save_video

    cfg, params = load_model(args)
    mesh = None
    if args.tp > 1:
        import jax

        from vda_tpu.parallel.mesh import make_mesh

        pin = jax.config.jax_default_device
        plat = pin if isinstance(pin, str) else getattr(pin, "platform", None)
        devices = jax.devices(plat) if plat else jax.devices()
        if len(devices) < args.tp:
            raise SystemExit(f"--tp {args.tp} exceeds the "
                             f"{len(devices)} local devices")
        # a stream has no batch dim to fan out: use exactly tp chips
        mesh = make_mesh(n_devices=args.tp, tp=args.tp, devices=devices)
    stream = StreamingDepth(params, cfg, input_size=args.input_size,
                            fp32=args.fp32, attn_impl=args.attn_impl,
                            cache_dtype=(None if args.cache_dtype == "auto"
                                         else args.cache_dtype),
                            mesh=mesh)

    cap = cv2.VideoCapture(args.input_video)
    if not cap.isOpened():
        raise FileNotFoundError(args.input_video)
    original_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    fps = original_fps if args.target_fps <= 0 else args.target_fps
    stride = max(round(original_fps / fps), 1)
    oh = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    ow = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    scale_needed = args.max_res > 0 and max(oh, ow) > args.max_res
    if scale_needed:
        s = args.max_res / max(oh, ow)
        height, width = ensure_even(round(oh * s)), ensure_even(round(ow * s))

    # Pipelined loop: submit frame n+1 (async dispatch) BEFORE fetching frame
    # n's depth, overlapping host decode + device->host transfer with device
    # compute; one frame (or one lookahead group) in flight bounds memory.
    depths = []
    pending = None
    batch = []
    count = 0
    n_submitted = 0
    t0 = time.time()

    def flush(handle):
        nonlocal pending
        if pending is not None:
            d = np.asarray(pending)
            depths.extend(d if d.ndim == 3 else [d])
        pending = handle

    while True:
        ret, frame = cap.read()
        if not ret or (args.max_len > 0 and n_submitted >= args.max_len):
            break
        if count % stride == 0:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if scale_needed:
                frame = cv2.resize(frame, (width, height))
            n_submitted += 1
            if args.lookahead <= 1 or n_submitted == 1:
                flush(stream.submit(frame))  # frame 1 initializes the stream
            else:
                batch.append(frame)
                if len(batch) == args.lookahead:
                    flush(stream.submit_group(np.stack(batch)))
                    batch = []
        count += 1
    for f in batch:  # leftover partial group: per-frame (static shapes)
        flush(stream.submit(f))
    flush(None)
    cap.release()
    wall = time.time() - t0
    print(f"{len(depths)} frames in {wall:.2f}s "
          f"({len(depths) / max(wall, 1e-9):.2f} fps)")

    stem = os.path.splitext(os.path.basename(args.input_video))[0]
    os.makedirs(args.output_dir, exist_ok=True)
    save_video(np.stack(depths), os.path.join(args.output_dir, stem + "_vis.mp4"),
               fps=fps, is_depths=True, grayscale=args.grayscale)
    return depths


if __name__ == "__main__":
    main()
