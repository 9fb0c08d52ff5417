"""Tracing / profiling utilities.

The reference has no built-in profiling (SURVEY §5.1 — only coarse wall-clock
prints).  This module is the TPU-native observability layer: per-stage
wall-clock timers that correctly synchronize device work (under the axon
tunnel ``block_until_ready`` is a no-op, so a small host fetch is used), plus
a wrapper around ``jax.profiler`` trace collection for Perfetto/XProf.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional

import numpy as np


def device_sync(tree) -> None:
    """Truly wait for device work feeding `tree` (fetches one element)."""
    import jax

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf[(0,) * leaf.ndim]) if leaf.ndim else np.asarray(leaf)
            break


class StageTimer:
    """Accumulating per-stage timer.

    with timer.stage("encode"): out = encoder(...)
    timer.report() -> {"encode": {"total_s": ..., "count": ..., "mean_ms": ...}}
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self._acc: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result_tree=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and result_tree is not None:
                device_sync(result_tree)
            self._acc.setdefault(name, []).append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self._acc.setdefault(name, []).append(seconds)

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self._acc.items():
            out[name] = {
                "total_s": round(sum(vals), 4),
                "count": len(vals),
                "mean_ms": round(1000 * sum(vals) / len(vals), 3),
                "p50_ms": round(1000 * sorted(vals)[len(vals) // 2], 3),
            }
        return out

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Collect a jax.profiler trace (viewable in XProf/Perfetto).

    No-op with a warning if the backend can't trace (e.g. tunneled devices).
    """
    import jax

    if log_dir is None:
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # noqa: BLE001
        print(f"[vda_tpu] profiler trace unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
