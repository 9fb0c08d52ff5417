"""Persistent XLA compilation cache.

vitl window compiles take 1-4 min through the axon remote compile server
(CLAUDE.md); the JAX persistent compilation cache keys serialized executables
by HLO hash so separate processes (CLI runs, bench.py, the engine daemon)
skip recompilation.  The reference has no analog — torch eager pays no
compile, JAX does, so this is part of making the JAX build production-usable.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/vda_tpu/jax_cache")


def enable_persistent_cache(path: str | None = None) -> bool:
    """Enable the JAX persistent compilation cache.  Safe to call multiple
    times; returns False if the running JAX build doesn't support it (or the
    backend refuses executable serialization)."""
    import jax

    path = path or os.environ.get("VDA_COMPILE_CACHE", DEFAULT_CACHE_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache anything that took >1s to compile, regardless of size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return False
    return True
