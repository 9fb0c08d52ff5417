#!/usr/bin/env python
"""Offline video depth CLI — flag-compatible rebuild of reference run.py:23-101.

Outputs: <name>_src.mp4, <name>_vis.mp4, optional NPZ (depths key), optional
per-frame EXR Z-channel, and metric-mode point clouds (PLY).

Checkpoints: loads the reference's torch ``.pth`` files through the converter
(default path ./checkpoints/{metric_}video_depth_anything_{enc}.pth, reference
run.py:50-54) or a native ``.npz`` params file.  ``--random-init`` runs with
random weights for pipeline testing on machines without checkpoints.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Video Depth Anything (TPU)")
    parser.add_argument("--input_video", type=str,
                        default="./assets/example_videos/davis_rollercoaster.mp4")
    parser.add_argument("--output_dir", type=str, default="./outputs")
    parser.add_argument("--input_size", type=int, default=518)
    parser.add_argument("--max_res", type=int, default=1280)
    parser.add_argument("--encoder", type=str, default="vitl",
                        choices=["vits", "vitb", "vitl", "vitg", "tiny"])
    parser.add_argument("--max_len", type=int, default=-1,
                        help="maximum length of the input video, -1 no limit")
    parser.add_argument("--target_fps", type=int, default=-1,
                        help="target fps, -1 keeps the original fps")
    parser.add_argument("--metric", action="store_true",
                        help="use metric depth model")
    parser.add_argument("--fp32", action="store_true",
                        help="run in float32 (default bfloat16)")
    parser.add_argument("--grayscale", action="store_true",
                        help="do not apply colorful palette")
    parser.add_argument("--save_npz", action="store_true")
    parser.add_argument("--save_exr", action="store_true")
    parser.add_argument("--focal-length-x", default=470.4, type=float)
    parser.add_argument("--focal-length-y", default=470.4, type=float)
    # extensions over the reference CLI
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="explicit .pth / .npz checkpoint path")
    parser.add_argument("--random-init", action="store_true",
                        help="random weights (pipeline testing only)")
    parser.add_argument("--attn-impl", type=str, default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--window-batch", type=int, default=1,
                        help="independent windows per forward (throughput)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree on a multi-chip host: "
                             "builds a ('data','model') mesh over all local "
                             "devices with this model-axis size and shards "
                             "the network head-aligned (infer/windowed.py); "
                             "window fan-out fills the data axis")
    return parser


DEFAULT_VIDEO = "./assets/example_videos/davis_rollercoaster.mp4"


def _ensure_example_video(path: str) -> None:
    """The repo ships no binary assets (reference run.py:24 assumes a checked
    -in example clip).  When the user runs the literal default command on a
    fresh clone, synthesize the example video instead of failing — same
    generator as examples/make_test_video.py."""
    if os.path.exists(path):
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.argv, argv_prev = [sys.argv[0], path, "--frames", "64"], sys.argv
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "make_test_video",
            os.path.join(here, "examples", "make_test_video.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        print(f"default example video was missing — generated a synthetic "
              f"clip at {path}")
    finally:
        sys.argv = argv_prev


def load_model(args):
    from vda_tpu.utils.loader import load_model_params

    return load_model_params(
        args.encoder,
        metric=getattr(args, "metric", False),
        checkpoint=args.checkpoint,
        random_init=args.random_init,
        cast_bf16=not getattr(args, "fp32", False))


def main(argv=None):
    args = build_arg_parser().parse_args(argv)

    from vda_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # vitl compiles are minutes; cache across runs

    from vda_tpu.infer import infer_video_depth
    from vda_tpu.utils.io import (
        read_video_frames,
        save_depth_exr_sequence,
        save_depths_npz,
        save_point_clouds,
        save_video,
    )

    if args.input_video == DEFAULT_VIDEO:
        _ensure_example_video(args.input_video)
    cfg, params = load_model(args)
    frames, target_fps = read_video_frames(
        args.input_video, args.max_len, args.target_fps, args.max_res)

    def progress(i, n):
        print(f"\rwindow {i}/{n}", end="", flush=True)

    import jax

    # devices of the platform inference actually runs on: honor an explicit
    # jax_default_device pin (tests force CPU this way — the axon TPU plugin
    # ignores JAX_PLATFORMS) before falling back to the default backend
    pin = jax.config.jax_default_device  # a Device, platform str, or None
    plat = pin if isinstance(pin, str) else getattr(pin, "platform", None)
    devices = jax.devices(plat) if plat else jax.devices()
    mesh = None
    if args.tp > 1 or (args.window_batch > 1 and len(devices) > 1):
        from vda_tpu.parallel.mesh import make_mesh

        if args.tp <= 1:
            # plain --window-batch N: shard over at most N devices so the
            # driver keeps the requested batch (windowed.py rounds the batch
            # UP to fill the data axis — a mesh over all 8 local devices
            # would silently inflate wb 2 -> 8).  --tp keeps the
            # fill-the-data-axis semantics its help text documents.
            devices = devices[:min(len(devices), args.window_batch)]
        if len(devices) % max(args.tp, 1) != 0:
            raise SystemExit(f"--tp {args.tp} does not divide the "
                             f"{len(devices)} local devices")
        mesh = make_mesh(tp=max(args.tp, 1), devices=devices)

    import contextlib
    with (jax.set_mesh(mesh) if mesh is not None
          else contextlib.nullcontext()):
        depths, fps = infer_video_depth(
            params, frames, target_fps, cfg, input_size=args.input_size,
            fp32=args.fp32, attn_impl=args.attn_impl,
            window_batch=args.window_batch, progress=progress, mesh=mesh)
    print()

    video_name = os.path.basename(args.input_video)
    stem = os.path.splitext(video_name)[0]
    os.makedirs(args.output_dir, exist_ok=True)

    save_video(frames, os.path.join(args.output_dir, stem + "_src.mp4"),
               fps=fps)
    save_video(depths, os.path.join(args.output_dir, stem + "_vis.mp4"),
               fps=fps, is_depths=True, grayscale=args.grayscale)

    if args.save_npz:
        save_depths_npz(os.path.join(args.output_dir, stem + "_depths.npz"),
                        depths)
    if args.save_exr:
        save_depth_exr_sequence(
            os.path.join(args.output_dir, stem + "_depths_exr"), depths)
    if args.metric:
        save_point_clouds(args.output_dir, frames, depths,
                          args.focal_length_x, args.focal_length_y)
    print(f"done: {depths.shape[0]} frames -> {args.output_dir}")
    return depths


if __name__ == "__main__":
    main()
