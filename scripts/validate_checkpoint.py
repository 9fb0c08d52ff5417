#!/usr/bin/env python
"""One-command real-checkpoint validation (VERDICT r2 #4).

The repo's numerical fidelity is proven against the torch reference with
converter-mapped random weights; the published checkpoints have never been
run here (no egress).  This harness closes that gap the minute egress
exists:

    python scripts/validate_checkpoint.py --encoder vitl \
        [--checkpoint checkpoints/video_depth_anything_vitl.pth] \
        [--video clip.mp4] [--frames 40] [--input-size 518]

It (1) downloads the published weights if missing (scripts/get_weights.sh),
(2) strict-converts the .pth into our pytree (any key/shape drift raises),
(3) runs the TORCH REFERENCE pipeline (/root/reference, CPU) and OUR
pipeline side-by-side on the same clip with the same weights, and
(4) asserts inter-pipeline agreement: per-frame affine-aligned delta1 >=
0.99 (the threshold-ratio metric the benchmark suite reports).

After this passes, run the full benchmark suite (benchmark/infer + eval)
against the published README numbers for the dataset-level check.

Tested end-to-end with a fabricated reference-format .pth in
tests/test_validate_checkpoint.py (no downloads involved).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from vda_tpu.config import checkpoint_name, get_config  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_checkpoint(encoder: str, metric: bool, checkpoint: str | None,
                      download: bool = True) -> str:
    """Resolve the checkpoint path, invoking scripts/get_weights.sh if the
    canonical file is absent and downloading is allowed."""
    path = checkpoint or os.path.join(
        "checkpoints", checkpoint_name(encoder, metric) + ".pth")
    if os.path.exists(path):
        return path
    if not download or checkpoint:
        raise FileNotFoundError(path)
    if encoder not in ("vits", "vitb", "vitl"):
        # get_weights.sh mirrors the reference download set (S/B/L only);
        # don't trigger gigabytes of downloads that cannot produce the file
        raise FileNotFoundError(
            f"{path}: no published checkpoint for encoder={encoder} "
            "(get_weights.sh provides vits/vitb/vitl) — pass --checkpoint")
    print(f"[validate] {path} missing -> scripts/get_weights.sh",
          flush=True)
    subprocess.run(["sh", os.path.join(REPO, "scripts", "get_weights.sh")],
                   check=True)
    if not os.path.exists(path):
        raise FileNotFoundError(f"{path} still missing after get_weights.sh")
    return path


def load_frames(video: str | None, n_frames: int, size: int):
    """Clip frames (uint8 HWC RGB) + fps.  Falls back to a deterministic
    synthetic pan over a gradient scene when no clip is given — enough to
    compare two pipelines running identical weights."""
    if video:
        from vda_tpu.utils.io import read_video_frames

        frames, fps = read_video_frames(video, process_length=n_frames)
        return frames, fps
    rng = np.random.default_rng(0)
    base = rng.random((size + n_frames, size + n_frames, 3))
    frames = np.stack([
        (base[i:i + size, i:i + size] * 255).astype(np.uint8)
        for i in range(n_frames)
    ])
    return frames, 24.0


def run_reference(sd, encoder: str, frames, fps, input_size: int):
    """The torch reference's infer_video_depth on CPU (fp32)."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from torch_ref import import_reference
    import_reference()
    from video_depth_anything.video_depth import VideoDepthAnything

    cfg = get_config(encoder)
    with torch.no_grad():
        model = VideoDepthAnything(
            encoder=encoder, features=cfg.features,
            out_channels=list(cfg.out_channels))
        model.load_state_dict(sd, strict=True)
        model.eval()
        depths, _ = model.infer_video_depth(
            frames, fps, input_size=input_size, device="cpu", fp32=True)
    return np.asarray(depths)


def run_ours(params, encoder: str, frames, fps, input_size: int):
    from vda_tpu.infer import infer_video_depth

    cfg = get_config(encoder)
    depths, _ = infer_video_depth(params, frames, fps, cfg,
                                  input_size=input_size, fp32=True)
    return np.asarray(depths)


def delta1_aligned(ref: np.ndarray, got: np.ndarray, floor: float = 1e-4):
    """Per-frame affine-aligned delta1 between two depth stacks."""
    out = []
    for r, g in zip(ref, got):
        r = r.reshape(-1).astype(np.float64)
        g = g.reshape(-1).astype(np.float64)
        a = np.stack([g, np.ones_like(g)], 1)
        s, t = np.linalg.lstsq(a, r, rcond=None)[0]
        g = np.maximum(s * g + t, floor)
        r = np.maximum(r, floor)
        out.append(float((np.maximum(g / r, r / g) < 1.25).mean()))
    return out


def run_stream_int8_check(params, encoder: str, frames, input_size: int):
    """delta1 between the bf16 and int8 streaming caches on real weights —
    closes the int8 opt-in's accuracy caveat (infer/streaming._write_step_q8)
    the moment weights are reachable."""
    from vda_tpu.infer import StreamingDepth

    cfg = get_config(encoder)
    outs = {}
    for cache_dtype in ("bf16", "int8"):
        s = StreamingDepth(params, cfg, input_size=input_size,
                           cache_dtype=cache_dtype)
        outs[cache_dtype] = np.stack(
            [np.asarray(s.submit(f)) for f in frames])
    return delta1_aligned(outs["bf16"], outs["int8"])


def validate(encoder: str = "vitl", metric: bool = False,
             checkpoint: str | None = None, video: str | None = None,
             n_frames: int = 40, input_size: int = 518,
             download: bool = True, threshold: float = 0.99,
             stream_int8: bool = False) -> dict:
    import torch

    from vda_tpu.utils.convert import convert_state_dict

    path = ensure_checkpoint(encoder, metric, checkpoint, download)
    print(f"[validate] loading {path}", flush=True)
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]

    cfg = get_config(encoder, metric=metric)
    params = convert_state_dict(sd, cfg, strict=True)  # drift raises here
    print("[validate] strict conversion OK", flush=True)

    frames, fps = load_frames(video, n_frames, max(input_size, 128))
    print(f"[validate] {len(frames)} frames @ {fps} fps, "
          f"input_size={input_size}", flush=True)

    ref = run_reference(sd, encoder, frames, fps, input_size)
    got = run_ours(params, encoder, frames, fps, input_size)
    assert ref.shape == got.shape, (ref.shape, got.shape)

    d1 = delta1_aligned(ref, got)
    result = {
        "checkpoint": path,
        "frames": len(frames),
        "delta1_min": min(d1),
        "delta1_mean": float(np.mean(d1)),
        "ok": min(d1) >= threshold,
    }
    print(f"[validate] inter-pipeline delta1 min={result['delta1_min']:.4f} "
          f"mean={result['delta1_mean']:.4f} -> "
          f"{'OK' if result['ok'] else 'FAIL'}", flush=True)
    if stream_int8:
        d1q = run_stream_int8_check(params, encoder, frames, input_size)
        result["stream_int8_delta1_min"] = min(d1q)
        result["stream_int8_ok"] = min(d1q) >= threshold
        print(f"[validate] int8-vs-bf16 streaming cache delta1 "
              f"min={min(d1q):.4f} -> "
              f"{'OK' if result['stream_int8_ok'] else 'FAIL'}", flush=True)
        result["ok"] = result["ok"] and result["stream_int8_ok"]
    if not result["ok"]:
        raise SystemExit(
            f"validation failed: {result}")
    return result


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--encoder", default="vitl",
                    choices=["vits", "vitb", "vitl", "vitg"])
    ap.add_argument("--metric", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--video", default=None,
                    help="clip to compare on (default: synthetic pan)")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--input-size", type=int, default=518)
    ap.add_argument("--no-download", action="store_true")
    ap.add_argument("--threshold", type=float, default=0.99)
    ap.add_argument("--stream-int8", action="store_true",
                    help="also validate the int8 streaming cache "
                         "(cache_dtype='int8') against the bf16 cache")
    a = ap.parse_args()
    validate(a.encoder, a.metric, a.checkpoint, a.video, a.frames,
             a.input_size, download=not a.no_download, threshold=a.threshold,
             stream_int8=a.stream_int8)


if __name__ == "__main__":
    main()
