#!/usr/bin/env python
"""Egress-free accuracy gate for the int8 streaming cache (VERDICT r4 #1).

The int8 per-row-quantized KV cache (infer/streaming._write_step_q8) wins a
reproducible -0.6...-0.7 ms/frame (r4 interleaved A/B in bench.py) but its
promotion to default was gated on real-checkpoint validation — unreachable
for four rounds (no egress).  This is the STRONGEST gate the environment
allows instead:

  * weights: converter-mapped TORCH-INITIALIZED weights — the actual torch
    reference model (/root/reference) is constructed with its own default
    init and strict-converted through utils/convert.convert_state_dict, so
    the value distributions the quantizer sees are the reference's init
    statistics, not ours (the output bias is nudged positive, as in every
    parity test, because random-init depth is otherwise all-zero: negative
    final conv bias + ReLU);
  * video: STRUCTURED synthetic frames (panning smoothed texture + moving
    gradients + a traveling bright patch — not constant frames), long enough
    to cross the eviction threshold (STREAM_GAP, step ~42) so steady-state
    bookkeeping and re-quantized anchor reads are both exercised;
  * metric: per-frame affine-aligned delta1 between the bf16-cache and
    int8-cache streams (scripts/validate_checkpoint.delta1_aligned — the
    same metric the real-weight gate will use), plus max-rel and a
    non-degeneracy check (the depth must have spatial structure, otherwise
    the gate is vacuous).

Worst-case quantization error bound (documented per VERDICT r4 #1): the
write path quantizes each cache row with one fp32 scale s = amax/127 and
round-to-nearest, so the elementwise error is <= s/2 = amax/254 — under
0.4% of the row's max |activation|.  Only cached K/V projections are
quantized; queries, attention math, and everything downstream stay bf16,
whose own rounding step (~0.4% rel) is the same order — int8 rows add at
most one extra bf16-sized rounding to values that already pass the bf16
fidelity suite (tests/test_bf16_fidelity.py).

Pass (min delta1 >= threshold, default 0.99) promotes cache_dtype="int8"
to the library default (infer/streaming._DEFAULT_CACHE_DTYPE).  REVERT
HOOK: when real checkpoints become reachable run
`scripts/validate_checkpoint.py --stream-int8`; a failure there demotes the
default (env VDA_STREAM_CACHE_DTYPE=bf16 overrides immediately).

Usage (full-scale vitl on the chip, ~5 min incl. compiles):

    python scripts/gate_stream_int8.py --encoder vitl --frames 64 \
        --input-size 518 --out docs/INT8_GATE.json

CPU smoke (tiny shapes): tests/test_gate_stream_int8.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from vda_tpu.utils.cache import enable_persistent_cache  # noqa: E402

# vitl streaming compiles are 1-4 min each through the remote compile
# server; without the persistent cache the gate pays them all fresh every
# run (r5 lesson: the first gate attempt timed out in compiles alone)
enable_persistent_cache()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synthetic_video(n_frames: int, size: int, seed: int = 0) -> np.ndarray:
    """Structured moving frames (uint8 HWC RGB): a panning smoothed random
    texture + a rotating linear gradient + a traveling bright patch.  Every
    frame differs from its neighbors (real temporal-attention content), and
    the spatial frequencies span DC to patch-scale."""
    rng = np.random.default_rng(seed)
    # the box-smooth below shrinks the texture by k per axis — pad for the
    # max pan offset 4*(n_frames-1) PLUS that shrinkage
    pad = 4 * n_frames + 2 * 9
    base = rng.random((size + pad, size + pad, 3)).astype(np.float32)
    # cheap separable box-smooth to give the texture spatial correlation
    for axis in (0, 1):
        k = 9
        c = np.cumsum(base, axis=axis)
        take = np.arange(size + pad - k) + k
        sl = [slice(None)] * 3
        sl0 = list(sl)
        sl[axis] = take
        sl0[axis] = take - k
        base = (c[tuple(sl)] - c[tuple(sl0)]) / k
    h = w = size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.empty((n_frames, h, w, 3), np.uint8)
    for i in range(n_frames):
        off = 4 * i
        tex = base[off:off + h, off:off + w]
        ang = 2 * np.pi * i / max(n_frames, 1)
        grad = (np.cos(ang) * xx + np.sin(ang) * yy) / max(h, w)
        grad = (grad - grad.min()) / max(float(np.ptp(grad)), 1e-6)
        cy = int((0.2 + 0.6 * i / max(n_frames - 1, 1)) * h)
        cx = int((0.7 - 0.4 * i / max(n_frames - 1, 1)) * w)
        patch = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2)
                         / (0.02 * h * w)))
        f = 0.55 * tex + 0.30 * grad[..., None] + 0.45 * patch[..., None]
        frames[i] = np.clip(f * 255.0, 0, 255).astype(np.uint8)
    return frames


def torch_init_params(cfg, encoder: str):
    """Converter-mapped torch-initialized weights: the torch reference's own
    module init, strict-converted into our pytree (reference
    video_depth_anything/vda/__init__-equivalent factory dinov2.py:381-395 +
    dpt_temporal.py)."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from torch_ref import import_reference

    from vda_tpu.utils.convert import convert_state_dict

    import_reference()
    from video_depth_anything.video_depth import VideoDepthAnything

    torch.manual_seed(0)
    with torch.no_grad():
        m = VideoDepthAnything(encoder=encoder, features=cfg.features,
                               out_channels=list(cfg.out_channels))
        sd = m.state_dict()
        # random-init depth is all-zero without this (negative final conv
        # bias + ReLU) — same nudge as the parity/fidelity tests
        key = "head.scratch.output_conv2.2.bias"
        sd[key] = sd[key].abs() + 0.5
    params = convert_state_dict(sd, cfg, strict=True)
    del m, sd
    return params


def run_gate(encoder: str = "vitl", n_frames: int = 64, input_size: int = 518,
             threshold: float = 0.99, params=None, cfg=None,
             frames=None, min_spread: float = 0.01) -> dict:
    """Run both cache flavors over the same stream and score agreement.
    params/cfg/frames injectable for the tiny-model CPU test."""
    from vda_tpu.config import get_config
    from vda_tpu.infer import StreamingDepth

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from validate_checkpoint import delta1_aligned

    if cfg is None:
        cfg = get_config(encoder)
    if params is None:
        t0 = time.time()
        params = torch_init_params(cfg, encoder)
        print(f"[gate] torch-init + strict convert: {time.time()-t0:.1f}s",
              flush=True)
        from vda_tpu.utils.convert import cast_params_for_inference
        params = cast_params_for_inference(params)
    if frames is None:
        frames = synthetic_video(n_frames, input_size)

    outs = {}
    for cache_dtype in ("bf16", "int8"):
        t0 = time.time()
        s = StreamingDepth(params, cfg, input_size=input_size,
                           cache_dtype=cache_dtype)
        handles = [s.submit(f) for f in frames]
        outs[cache_dtype] = np.stack([np.asarray(h) for h in handles])
        print(f"[gate] {cache_dtype} stream: {len(frames)} frames in "
              f"{time.time()-t0:.1f}s", flush=True)

    ref, got = outs["bf16"], outs["int8"]
    # non-degeneracy: a flat depth would make delta1 trivially 1.0
    spread = float(np.median(ref.std(axis=(1, 2)) /
                             np.maximum(np.abs(ref).mean(axis=(1, 2)), 1e-9)))
    d1 = delta1_aligned(ref, got)
    denom = max(float(np.abs(ref).max()), 1e-9)
    max_rel = float(np.abs(ref - got).max() / denom)
    result = {
        "encoder": encoder,
        "frames": int(len(frames)),
        "input_size": int(input_size),
        "weights": "converter-mapped torch-init (reference module init)",
        "video": "structured synthetic (panning texture + moving gradients)",
        "depth_rel_spread_median": round(spread, 4),
        "delta1_min": round(min(d1), 6),
        "delta1_mean": round(float(np.mean(d1)), 6),
        "max_rel": round(max_rel, 6),
        "threshold": threshold,
        "quant_error_bound": "per-row amax/254 (<0.4% of row max)",
        "min_spread": min_spread,
        "ok": bool(min(d1) >= threshold and spread > min_spread),
    }
    return result


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--encoder", default="vitl",
                    choices=["vits", "vitb", "vitl", "vitg"])
    ap.add_argument("--frames", type=int, default=64,
                    help=">= 48 crosses the eviction threshold (~step 42)")
    ap.add_argument("--input-size", type=int, default=518)
    ap.add_argument("--threshold", type=float, default=0.99)
    ap.add_argument("--out", default=None, help="write the JSON artifact")
    a = ap.parse_args()
    result = run_gate(a.encoder, a.frames, a.input_size, a.threshold)
    line = json.dumps(result)
    print(line, flush=True)
    if a.out:
        with open(a.out, "w") as f:
            f.write(line + "\n")
    if not result["ok"]:
        raise SystemExit(f"int8 gate FAILED: {result}")


if __name__ == "__main__":
    main()
