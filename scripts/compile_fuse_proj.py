"""On-chip Mosaic compile probe for the fused attention+projection kernel.

Novel kernel structures MUST be compile-tested at a tiny shape with a
timeout before full shapes — a pathological kernel can hang the remote
compile server and wedge the tunnel (see CLAUDE.md).  Run:

    timeout 300 python scripts/compile_fuse_proj.py          # tiny
    timeout 600 python scripts/compile_fuse_proj.py --full   # vitl window
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vda_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from vda_tpu.ops.pallas_attention import flash_attention_qkv_proj


def run(b, n, heads, dh, label):
    hd = heads * dh
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (b, n, 3 * hd), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (hd, hd)) * 0.02
    gb = jnp.stack([jnp.full((hd,), 1e-5), jnp.zeros((hd,))])
    x = jax.random.normal(jax.random.PRNGKey(2), (b, n, hd))
    qkv, w, x = (t.astype(jnp.bfloat16) for t in (qkv, w, x))

    t0 = time.perf_counter()
    out = flash_attention_qkv_proj(qkv, w, gb.astype(jnp.float32), x,
                                   heads, scale=dh ** -0.5)
    got = np.asarray(out, np.float32)
    dt = time.perf_counter() - t0

    # reference in plain jnp
    q, k, v = (t.astype(jnp.float32) for t in jnp.split(qkv, 3, axis=-1))
    qh = q.reshape(b, n, heads, dh)
    kh = k.reshape(b, n, heads, dh)
    vh = v.reshape(b, n, heads, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * dh ** -0.5
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, n, hd)
    ref = (x.astype(jnp.float32)
           + gb[0] * (o @ w.astype(jnp.float32) + gb[1]))
    ref = np.asarray(ref, np.float32)
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-6)
    print(f"{label}: compiled+ran in {dt:.1f}s  max_rel {err:.3e}",
          flush=True)
    return err


def main():
    print(f"devices: {jax.devices()}", flush=True)
    err = run(2, 256, 4, 32, "tiny (2,256,4x32)")
    assert err < 3e-2
    if "--full" in sys.argv:
        err = run(32, 1376, 16, 64, "vitl window (32,1376,16x64)")
        assert err < 3e-2
    print("OK", flush=True)


if __name__ == "__main__":
    main()
