#!/usr/bin/env python
"""Tiny-shape Mosaic compile probe for the 16-granule attention path.

VDA_PAD_GRANULE=16 runs flash_attention_qkv at a 16-aligned (not
128-aligned) sequence length with in-kernel key masking.  A pathological
Pallas structure can HANG the remote Mosaic compiler and wedge the whole
tunnel (CLAUDE.md), so this compiles the exact kernel configuration at a
tiny shape first, alarm-bounded.  Exit 0 = safe to run the full A/B.

Numerics of the 16-granule path are already pinned on CPU
(tests/test_model.py pad-granule test, tests/test_pallas_attention.py);
this checks only that the compile completes and the on-chip output
matches XLA at the tiny shape.
"""

import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    timeout = int(os.environ.get("VDA_PROBE_TIMEOUT", "300"))
    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(
        TimeoutError(f"compile exceeded {timeout}s — possible Mosaic HANG")))
    signal.alarm(timeout)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vda_tpu.ops.attention import packed_self_attention
    from vda_tpu.ops.pallas_attention import flash_attention_qkv

    # tiny 16-aligned-but-not-128-aligned shape: n=176, valid 170 -> the
    # kernel takes the np_len == n (granule-16) route with key masking,
    # the same structure the full vitl window uses at np_len=1376
    b, n, heads, d = 2, 176, 2, 64
    valid = 170
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * heads * d),
                            jnp.bfloat16)

    out = flash_attention_qkv(qkv, heads, scale=d ** -0.5, valid_len=valid)
    out = np.asarray(out[:, :valid].astype(jnp.float32))

    q, k, v = jnp.split(qkv[:, :valid], 3, axis=-1)
    ref = np.asarray(packed_self_attention(q, k, v, heads, scale=d ** -0.5,
                                           impl="xla").astype(jnp.float32))
    rel = float(np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6))
    signal.alarm(0)
    ok = rel < 2e-2
    print(f"granule16 probe: rel={rel:.2e} ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
