"""Granular compile probe for ops/pallas_stream on the real chip.

The first version of the kernel hung the remote Mosaic compiler (>15 min,
no error) and wedged the tunnel.  This probe compiles one feature at a time
at a TINY shape, each wrapped in a subprocess alarm, so one run localizes a
pathological construct without risking the tunnel.

    python scripts/probe_stream_kernel.py [stage ...]
stages: trivial dot2 mask pe new full full1024 big
"""

import signal
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BHW, ROWS, C, HEADS, G = 32, 43, 256, 8, 16


def run_stage(name, fn, budget=240):
    print(f"[{name}] compiling (budget {budget}s)...", flush=True)

    def handler(signum, frame):
        raise TimeoutError(name)

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(budget)
    t0 = time.perf_counter()
    try:
        out = fn()
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
        print(f"[{name}] OK in {time.perf_counter()-t0:.1f}s", flush=True)
        return True
    except TimeoutError:
        print(f"[{name}] HANG (> {budget}s) — pathological construct here",
              flush=True)
        return False
    finally:
        signal.alarm(0)


def make_inputs(bhw=BHW, c=C):
    rng = np.random.default_rng(0)
    q, kn, vn = (jnp.asarray(rng.standard_normal((bhw, c)), jnp.bfloat16)
                 for _ in range(3))
    kb, vb = (jnp.asarray(rng.standard_normal((bhw, ROWS, c)), jnp.bfloat16)
              for _ in range(2))
    pe = jnp.asarray(rng.standard_normal((ROWS, c)) * 0.1, jnp.bfloat16)
    valid = np.ones(ROWS, bool)
    valid[31:] = False
    return q, kn, vn, kb, vb, pe, valid


def simple_kernel(feats):
    """Reduced kernels: dot over the (G*ROWS, gw) tile with optional
    features, bisecting the full kernel's structure."""
    q, kn, vn, kb, vb, pe, valid = make_inputs()
    gw = C
    dh = C // HEADS
    same = (np.arange(G * ROWS) // ROWS)[None] == np.arange(G)[:, None]
    ok = same & np.tile(valid, G)[None]
    mask = jnp.asarray(np.where(ok, 0.0, -1e30), jnp.float32)
    eye = jnp.asarray(np.where(np.eye(G, dtype=bool), 0.0, -1e30),
                      jnp.float32)
    pe_t = jnp.tile(pe, (G, 1))

    def kern(q_ref, kn_ref, vn_ref, kb_ref, vb_ref, pe_ref, m_ref, e_ref,
             o_ref):
        for h in range(HEADS):
            sl = slice(h * dh, (h + 1) * dh)
            kh = kb_ref[:, sl]
            if "pe" in feats:
                kh = kh + pe_ref[:, sl]
            s = jax.lax.dot_general(q_ref[:, sl], kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if "mask" in feats:
                s = s * 0.17678 + m_ref[...]
            if "softmax" in feats:
                mx = jnp.max(s, axis=-1, keepdims=True)
                if "new" in feats:
                    sn = jax.lax.dot_general(
                        q_ref[:, sl], kn_ref[:, sl], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) + e_ref[...]
                    mx = jnp.maximum(mx, jnp.max(sn, axis=-1, keepdims=True))
                e = jnp.exp((s - mx).astype(jnp.bfloat16))
                z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
                o = jax.lax.dot_general(e, vb_ref[:, sl],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                if "new" in feats:
                    en = jnp.exp((sn - mx).astype(jnp.bfloat16))
                    z = z + jnp.sum(en.astype(jnp.float32), axis=-1,
                                    keepdims=True)
                    o = o + jax.lax.dot_general(
                        en, vn_ref[:, sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                o_ref[:, sl] = (o / z).astype(o_ref.dtype)
            else:
                o_ref[:, sl] = jax.lax.dot_general(
                    s.astype(jnp.bfloat16), vb_ref[:, sl],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(BHW // G, 1),
        in_specs=[
            pl.BlockSpec((G, gw), lambda i, g_: (i, g_)),
            pl.BlockSpec((G, gw), lambda i, g_: (i, g_)),
            pl.BlockSpec((G, gw), lambda i, g_: (i, g_)),
            pl.BlockSpec((G * ROWS, gw), lambda i, g_: (i, g_)),
            pl.BlockSpec((G * ROWS, gw), lambda i, g_: (i, g_)),
            pl.BlockSpec((G * ROWS, gw), lambda i, g_: (0, g_)),
            pl.BlockSpec((G, G * ROWS), lambda i, g_: (0, 0)),
            pl.BlockSpec((G, G), lambda i, g_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G, gw), lambda i, g_: (i, g_)),
        out_shape=jax.ShapeDtypeStruct((BHW, C), jnp.bfloat16),
    )(q, kn, vn, kb.reshape(BHW * ROWS, C), vb.reshape(BHW * ROWS, C),
      pe_t, mask, eye)


def main():
    want = sys.argv[1:] or ["trivial", "dot2", "mask", "pe", "new", "full",
                            "full1024"]
    if "trivial" in want:
        ok = run_stage("trivial-jit", lambda: jax.jit(
            lambda a: (a @ a) * 1.000451)(jnp.ones((128, 128), jnp.bfloat16)),
            budget=120)
        if not ok:
            print("tunnel itself is wedged — stop here", flush=True)
            return
    if "dot2" in want:
        run_stage("dot-only", lambda: simple_kernel(set()))
    if "mask" in want:
        run_stage("dot+mask", lambda: simple_kernel({"mask"}))
    if "pe" in want:
        run_stage("dot+mask+pe+softmax",
                  lambda: simple_kernel({"mask", "pe", "softmax"}))
    if "new" in want:
        run_stage("all-features",
                  lambda: simple_kernel({"mask", "pe", "softmax", "new"}))
    if "full" in want:
        from vda_tpu.ops.pallas_stream import stream_kv_attention
        q, kn, vn, kb, vb, pe, valid = make_inputs()
        run_stage("real-kernel-c256", lambda: stream_kv_attention(
            q, kn, vn, kb, vb, pe, pe, jnp.asarray(valid), heads=HEADS,
            scale=0.17678))
    if "full1024" in want:
        from vda_tpu.ops.pallas_stream import stream_kv_attention
        q, kn, vn, kb, vb, pe, valid = make_inputs(bhw=32, c=1024)
        run_stage("real-kernel-c1024", lambda: stream_kv_attention(
            q, kn, vn, kb, vb, pe, pe, jnp.asarray(valid), heads=HEADS,
            scale=0.0883883), budget=300)
    if "big" in want:
        from vda_tpu.ops.pallas_stream import stream_kv_attention
        q, kn, vn, kb, vb, pe, valid = make_inputs(bhw=1376, c=1024)
        run_stage("real-kernel-1376x1024", lambda: stream_kv_attention(
            q, kn, vn, kb, vb, pe, pe, jnp.asarray(valid), heads=HEADS,
            scale=0.0883883), budget=420)


if __name__ == "__main__":
    main()
