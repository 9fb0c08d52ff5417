"""Hardware-tiered processing strategies and depth post-processing.

Rebuild of the reference's hardened engine iteration
(external_engine/engine_backup.py): hardware capability detection
(:187-410), tiered processing-strategy selection by accelerator/host memory
(:484-586), optional temporal median + bilateral stabilization (:1414-1488),
and depth upscaling to the original resolution (:1556-1608).  Tiers are
re-expressed for TPU hosts: the accelerator question is "is a TPU visible
and how much HBM does it have", the fallback ladder is TPU -> CPU, and the
memory-driven knob is the network input size (518/384/224) plus decoder
micro-batch size.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


def detect_hardware() -> Dict:
    """Detect accelerator + host capabilities."""
    info: Dict = {"accelerator": "cpu", "accelerator_count": 0,
                  "accelerator_memory_gb": 0.0}
    try:
        import jax

        devs = jax.devices()
        if devs and devs[0].platform != "cpu":
            info["accelerator"] = devs[0].platform
            info["accelerator_count"] = len(devs)
            stats = {}
            try:
                stats = devs[0].memory_stats() or {}
            except Exception:
                pass
            info["accelerator_memory_gb"] = round(
                stats.get("bytes_limit", 16 * 2 ** 30) / 2 ** 30, 1)
    except Exception:
        pass
    try:
        import os

        info["cpu_count"] = os.cpu_count()
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    info["host_memory_gb"] = round(
                        int(line.split()[1]) / 2 ** 20, 1)
                    break
    except Exception:
        pass
    return info


@dataclasses.dataclass(frozen=True)
class ProcessingStrategy:
    name: str
    input_size: int          # network input (518 / 384 / 224)
    micro_batch_size: int    # decoder-tail chunk (frames)
    fp32: bool
    description: str


STRATEGIES = {
    # analogs of the reference tiers gpu_direct / gpu_conservative_4k /
    # gpu_with_cpu_fallback / cpu_direct (engine_backup.py:484-586)
    "tpu_direct": ProcessingStrategy(
        "tpu_direct", 518, 8, False,
        "TPU with ample HBM: full 518 input, bf16, wide decoder chunks"),
    "tpu_conservative": ProcessingStrategy(
        "tpu_conservative", 384, 4, False,
        "TPU with limited HBM or 4K+ sources: reduced input size"),
    "cpu_fallback": ProcessingStrategy(
        "cpu_fallback", 224, 2, True,
        "no accelerator: smallest input, fp32 on host"),
}


def select_strategy(hardware: Optional[Dict] = None,
                    source_pixels: int = 0) -> ProcessingStrategy:
    """Pick a tier from capabilities + source size
    (reference engine_backup.py:484-586)."""
    hw = hardware or detect_hardware()
    if hw["accelerator"] == "cpu" or hw["accelerator_count"] == 0:
        return STRATEGIES["cpu_fallback"]
    mem = hw.get("accelerator_memory_gb", 16.0)
    is_4k = source_pixels > 3840 * 2160 * 0.9
    if mem < 12.0 or is_4k:
        return STRATEGIES["tpu_conservative"]
    return STRATEGIES["tpu_direct"]


# ---------------------------------------------------------------------------
# depth post-processing (reference engine_backup.py:1414-1488, 1556-1608)
# ---------------------------------------------------------------------------

def stabilize_depth_sequence(depths: np.ndarray, temporal_window: int = 3,
                             bilateral_d: int = 5,
                             bilateral_sigma: float = 25.0) -> np.ndarray:
    """Optional temporal median + per-frame bilateral smoothing."""
    import cv2

    n = depths.shape[0]
    half = temporal_window // 2
    out = np.empty_like(depths, dtype=np.float32)
    for i in range(n):
        lo, hi = max(0, i - half), min(n, i + half + 1)
        med = np.median(depths[lo:hi], axis=0).astype(np.float32)
        out[i] = cv2.bilateralFilter(med, bilateral_d, bilateral_sigma,
                                     bilateral_sigma)
    return out


def upscale_depth(depths: np.ndarray, target_hw) -> np.ndarray:
    """Bicubic upscale of a depth sequence to the original resolution."""
    import cv2

    th, tw = target_hw
    if depths.shape[1:3] == (th, tw):
        return depths
    return np.stack([
        cv2.resize(d, (tw, th), interpolation=cv2.INTER_CUBIC)
        for d in depths
    ])
