#!/usr/bin/env python
"""Fine-tuning CLI.

The reference ships VideoDepthLoss but no trainer (SURVEY §3.5); this is the
TPU-native training entry point: sharded AdamW steps over a ('data','model')
mesh with orbax checkpoint/resume.  Data comes from a directory of .npz
shards (keys: video (B,T,H,W,3) uint8 or float, depth (B,T,H,W), mask) or
--synthetic for a smoke run.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def npz_data_iter(data_dir: str, loop: bool = True):
    shards = sorted(glob.glob(os.path.join(data_dir, "*.npz")))
    if not shards:
        raise FileNotFoundError(f"no .npz shards under {data_dir}")
    while True:
        for path in shards:
            with np.load(path) as z:
                video = z["video"]
                if video.dtype == np.uint8:
                    video = video.astype(np.float32) / 255.0
                yield {
                    "video": video.astype(np.float32),
                    "depth": z["depth"].astype(np.float32),
                    "mask": z["mask"].astype(bool),
                }
        if not loop:
            return


def synthetic_iter(batch: int, frames: int, size: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    while True:
        yield {
            "video": rng.random((batch, frames, size, size, 3),
                                dtype=np.float32),
            "depth": (rng.random((batch, frames, size, size),
                                 dtype=np.float32) * 5 + 0.1),
            "mask": np.ones((batch, frames, size, size), bool),
        }


def main(argv=None):
    parser = argparse.ArgumentParser(description="VDA fine-tuning (TPU)")
    parser.add_argument("--encoder", default="vits",
                        choices=["vits", "vitb", "vitl", "tiny"])
    parser.add_argument("--checkpoint", default=None,
                        help=".pth/.npz initial weights (default random)")
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--size", type=int, default=266)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree")
    parser.add_argument("--ckpt-dir", default=None)
    parser.add_argument("--ckpt-every", type=int, default=500)
    args = parser.parse_args(argv)

    import jax

    from vda_tpu.config import get_config
    from vda_tpu.models import init_video_depth_anything
    from vda_tpu.parallel.trainer import train
    from vda_tpu.utils.convert import load_params_npz, load_torch_checkpoint

    cfg = get_config(args.encoder)
    if args.checkpoint is None:
        params = init_video_depth_anything(jax.random.PRNGKey(0), cfg)
    elif args.checkpoint.endswith(".npz"):
        params = load_params_npz(
            args.checkpoint, init_video_depth_anything(jax.random.PRNGKey(0),
                                                       cfg))
    else:
        params = load_torch_checkpoint(args.checkpoint, cfg)

    if args.synthetic or args.data_dir is None:
        data = synthetic_iter(args.batch, args.frames, args.size)
    else:
        data = npz_data_iter(args.data_dir)

    state = train(cfg, params, data, num_steps=args.steps,
                  ckpt_dir=args.ckpt_dir, ckpt_every=args.ckpt_every,
                  learning_rate=args.lr, tp=args.tp)
    print(f"done at step {int(state.step)}")
    return state


if __name__ == "__main__":
    main()
