#!/usr/bin/env python
"""Create a small synthetic test video (no checkpoints or assets needed).

    python examples/make_test_video.py /tmp/test.mp4 --frames 64
    python apps/run.py --input_video /tmp/test.mp4 --encoder vits \
        --random-init --input_size 252 --output_dir /tmp/out
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("output", help="output .mp4 path")
    parser.add_argument("--frames", type=int, default=64)
    parser.add_argument("--height", type=int, default=210)
    parser.add_argument("--width", type=int, default=320)
    parser.add_argument("--fps", type=float, default=24)
    args = parser.parse_args()

    import cv2

    rng = np.random.default_rng(0)
    h, w = args.height, args.width
    # textured background + a moving bright square (gives the depth net
    # structure to latch onto)
    bg = (cv2.GaussianBlur((rng.random((h, w, 3)) * 255).astype(np.uint8),
                           (0, 0), 3)).astype(np.uint8)
    writer = cv2.VideoWriter(args.output, cv2.VideoWriter_fourcc(*"mp4v"),
                             args.fps, (w, h))
    for i in range(args.frames):
        frame = np.roll(bg, i * 2, axis=1).copy()
        x0 = (i * 3) % (w - 40)
        y0 = h // 3
        frame[y0:y0 + 40, x0:x0 + 40] = (250, 220, 40)
        writer.write(frame[:, :, ::-1])
    writer.release()
    print(f"wrote {args.frames} frames to {args.output}")


if __name__ == "__main__":
    main()
