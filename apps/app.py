#!/usr/bin/env python
"""Gradio web demo (vitl) — rebuild of reference app.py:39-152.

Sliders for max_len / target_fps / max_res; returns the processed source and
depth-visualization MP4s.  Requires the optional ``gradio`` dependency.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_demo(encoder: str = "vitl", checkpoint: str = None,
               random_init: bool = False, input_size: int = 518):
    try:
        import gradio as gr
    except ImportError as e:
        raise SystemExit(
            "gradio is not installed in this environment; the demo UI is "
            "unavailable. Use apps/run.py for CLI inference.") from e

    from vda_tpu.infer import infer_video_depth
    from vda_tpu.utils.io import read_video_frames, save_video
    from vda_tpu.utils.loader import load_model_params

    cfg, params = load_model_params(encoder, checkpoint=checkpoint,
                                    random_init=random_init)

    def infer(video_path, max_len, target_fps, max_res):
        frames, fps = read_video_frames(video_path, int(max_len),
                                        int(target_fps), int(max_res))
        depths, out_fps = infer_video_depth(params, frames, fps, cfg,
                                            input_size=input_size)
        out_dir = tempfile.mkdtemp(prefix="vda_demo_")
        src = os.path.join(out_dir, "src.mp4")
        vis = os.path.join(out_dir, "vis.mp4")
        save_video(frames, src, fps=out_fps)
        save_video(depths, vis, fps=out_fps, is_depths=True)
        return src, vis

    with gr.Blocks(title="Video Depth Anything (TPU)") as demo:
        gr.Markdown("# Video Depth Anything — TPU-native")
        with gr.Row():
            inp = gr.Video(label="input video")
            with gr.Column():
                max_len = gr.Slider(-1, 1000, value=500, step=1,
                                    label="max length (frames)")
                target_fps = gr.Slider(-1, 30, value=15, step=1,
                                       label="target fps")
                max_res = gr.Slider(480, 1920, value=1280, step=2,
                                    label="max resolution")
                btn = gr.Button("Generate depth")
        with gr.Row():
            out_src = gr.Video(label="processed source")
            out_vis = gr.Video(label="depth visualization")
        btn.click(infer, [inp, max_len, target_fps, max_res],
                  [out_src, out_vis])
    return demo


if __name__ == "__main__":
    import argparse

    from vda_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # vitl compiles are minutes; cache across runs

    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder", default="vitl")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args()
    build_demo(args.encoder, args.checkpoint, args.random_init).launch(
        server_port=args.port)
