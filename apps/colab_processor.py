#!/usr/bin/env python
"""Batch image-sequence processor (Colab-style workflow).

Rebuild of reference colab_processor.py: load image-sequence frames by
template, run windowed inference, write an EXR Z-channel sequence numbered
from ``first_frame`` (VFX convention, typically 1001), plus an optional depth
visualization MP4.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from apps.engine.sequence import read_image_sequence  # noqa: E402


class BatchSequenceProcessor:
    """reference colab_processor.py:53-149 (ColabVDAProcessor)."""

    def __init__(self, encoder: str = "vits", metric: bool = False,
                 checkpoint: Optional[str] = None, fp32: bool = False,
                 random_init: bool = False, input_size: int = 518):
        from vda_tpu.utils.loader import load_model_params

        self.input_size = input_size
        self.fp32 = fp32
        self.cfg, self.params = load_model_params(
            encoder, metric=metric, checkpoint=checkpoint,
            random_init=random_init, cast_bf16=not fp32)

    def process_sequence(self, frame_template: str, first_frame: int,
                         last_frame: int, output_dir: str,
                         exr_first_frame: Optional[int] = None,
                         save_vis_mp4: bool = False,
                         fps: float = 24.0) -> List[str]:
        """One sequence -> EXR Z sequence (reference colab_processor.py:152-212).

        frame_template: e.g. /shots/sh010/plate.%04d.jpg
        """
        from vda_tpu.infer import infer_video_depth
        from vda_tpu.utils.io import save_depth_exr, save_video

        frames, numbers = read_image_sequence(frame_template, first_frame,
                                              last_frame)
        depths, _ = infer_video_depth(self.params, frames, fps, self.cfg,
                                      input_size=self.input_size,
                                      fp32=self.fp32)
        os.makedirs(output_dir, exist_ok=True)
        base = exr_first_frame if exr_first_frame is not None else numbers[0]
        written = []
        for i, depth in enumerate(depths):
            path = os.path.join(output_dir, f"depth.{base + i:04d}.exr")
            if not save_depth_exr(path, depth):
                path = path.replace(".exr", ".npy")
                np.save(path, depth.astype(np.float32))
            written.append(path)
        if save_vis_mp4:
            save_video(depths, os.path.join(output_dir, "depth_vis.mp4"),
                       fps=fps, is_depths=True)
        return written


def process_batch_sequences(config: Dict, encoder: str = "vits",
                            metric: bool = False,
                            checkpoint: Optional[str] = None,
                            fp32: bool = False,
                            random_init: bool = False) -> Dict[str, List[str]]:
    """Batch driver (reference colab_processor.py:152-212).

    config: {sequence_name: {"template": ..., "first_frame": int,
    "last_frame": int, "output_dir": ..., ["exr_first_frame": int,
    "save_vis_mp4": bool]}}
    """
    proc = BatchSequenceProcessor(encoder=encoder, metric=metric,
                                  checkpoint=checkpoint, fp32=fp32,
                                  random_init=random_init)
    results = {}
    for name, seq in config.items():
        results[name] = proc.process_sequence(
            seq["template"], int(seq["first_frame"]), int(seq["last_frame"]),
            seq["output_dir"],
            exr_first_frame=seq.get("exr_first_frame"),
            save_vis_mp4=bool(seq.get("save_vis_mp4", False)))
        print(f"{name}: {len(results[name])} frames -> {seq['output_dir']}")
    return results


if __name__ == "__main__":
    import argparse
    import json

    from vda_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # vitl compiles are minutes; cache across runs

    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="JSON batch config")
    parser.add_argument("--encoder", default="vits")
    parser.add_argument("--metric", action="store_true")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--random-init", action="store_true")
    args = parser.parse_args()
    with open(args.config) as f:
        config = json.load(f)
    process_batch_sequences(config, encoder=args.encoder, metric=args.metric,
                            checkpoint=args.checkpoint, fp32=args.fp32,
                            random_init=args.random_init)
