#!/usr/bin/env python
"""Streaming step decomposition (vitl, 518x518) on the real chip.

Measures the steady-state pipelined ms/frame (as bench.py does), then the
isolated pieces with the slope method: batch-1 encoder, head-with-cache, and
the cache gather/scatter.

    python scripts/bench_stream.py e2e      # pipelined end-to-end
    python scripts/bench_stream.py enc      # batch-1 encoder
    python scripts/bench_stream.py head     # head with 31-entry cache
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from vda_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def sync(r):
    return np.asarray(jax.tree_util.tree_leaves(r)[0])


def slope(fns, args, lo=2, hi=6, reps=3):
    out = {}
    for name, f in fns.items():
        sync(f(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(*args))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        out[name] = ts[len(ts) // 2]
    return (out["hi"] - out["lo"]) / (hi - lo) * 1e3


def main():
    stages = sys.argv[1:] or ["e2e"]
    from vda_tpu.config import get_config
    from vda_tpu.models import init_video_depth_anything
    from vda_tpu.utils.convert import cast_params_for_inference

    cfg = get_config("vitl")
    params = cast_params_for_inference(
        init_video_depth_anything(jax.random.PRNGKey(0), cfg))

    if "e2e" in stages:
        from vda_tpu.infer import StreamingDepth
        stream = StreamingDepth(params, cfg, input_size=518)
        frame = np.full((518, 518, 3), 128, np.uint8)
        for _ in range(14):
            d = stream.submit(frame)
        np.asarray(d)
        t0 = time.perf_counter()
        hs = [stream.submit(frame) for _ in range(32)]
        for h in hs:
            np.asarray(h)
        ms = (time.perf_counter() - t0) / 32 * 1e3
        print(f"streaming e2e (pipelined): {ms:.2f} ms/frame", flush=True)

    if "step" in stages:
        # In-graph cost of one READ-ONLY _stream_step (preprocess + encoder +
        # assembly + head + out-resize; the real submit commits rows via the
        # separate donated _write_step): k steps chained in ONE jit.
        #
        # Artifacts this harness defeats (measured, they lied):
        #   * DCE: accumulating a scalar of EVERY step's depth — otherwise
        #     XLA dead-code-eliminates the DPT tail of all but the last step
        #     (6.9 vs 13.9 ms measured).
        #   * CSE: each step gets a DIFFERENT frame AND a DIFFERENT ctx —
        #     with shared ones XLA computes the encoder (10.3 vs ~17.5 ms)
        #     and the one-hot context assembly ONCE for all chained steps.
        #
        # Even so this is an OPTIMISTIC BOUND, not a target: the buffers are
        # frozen, so XLA may overlap across chained steps in ways the real
        # causal cache dependency forbids; the e2e number is the honest cost.
        from vda_tpu.infer.streaming import (
            _BUF_ROWS,
            _CTX,
            _pad_rows,
            _stream_step,
        )
        shapes = [(1369, 1024), (361, 1024), (1369, 256), (5476, 256)]
        buffers = []
        for bhw, c in shapes:
            bp = _pad_rows(bhw)
            buffers += [(jnp.ones((bp, _BUF_ROWS, c), jnp.bfloat16),
                         jnp.ones((bp, _BUF_ROWS, c), jnp.bfloat16))] * 2
        frames = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, (6, 518, 518, 3), np.uint8))
        ctxs = jnp.asarray(
            (np.arange(_CTX)[None] + np.arange(6)[:, None]) % _BUF_ROWS,
            jnp.int32)
        inner = _stream_step.__wrapped__  # un-jitted body

        def make(k):
            @jax.jit
            def f(params, frames, buffers, ctxs):
                acc = jnp.float32(0)
                for i in range(k):
                    d, _ = inner(
                        params, frames[i], buffers, None, ctxs[i],
                        cfg, (518, 518), (518, 518), jnp.bfloat16, "auto",
                        "kv")
                    acc = acc + d[0, 0]
                return acc
            return f

        ms = slope({"lo": make(2), "hi": make(6)},
                   (params, frames, buffers, ctxs))
        print(f"read-only stream step in-graph: {ms:.2f} ms", flush=True)

    if "rstep" in stages:
        # in-graph cost of the steady-state RING step (_stream_step_ring:
        # three-slice context assembly).  Same DCE/CSE harness as "step".
        from vda_tpu.infer.streaming import _pad_rows
        from vda_tpu.infer.streaming_experimental import (
            _BUF_ROWS_RING,
            _stream_step_ring,
        )
        shapes = [(1369, 1024), (361, 1024), (1369, 256), (5476, 256)]
        buffers = []
        for bhw, c in shapes:
            bp = _pad_rows(bhw)
            buffers += [(jnp.ones((bp, _BUF_ROWS_RING, c), jnp.bfloat16),
                         jnp.ones((bp, _BUF_ROWS_RING, c), jnp.bfloat16))] * 2
        frames = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, (6, 518, 518, 3), np.uint8))
        inner = _stream_step_ring.__wrapped__

        def make(k):
            @jax.jit
            def f(params, frames, buffers):
                acc = jnp.float32(0)
                for i in range(k):
                    d, _ = inner(
                        params, frames[i], buffers, jnp.int32(2),
                        jnp.int32(3 + i),
                        cfg, (518, 518), (518, 518), jnp.bfloat16, "auto",
                        "kv")
                    acc = acc + d[0, 0]
                return acc
            return f

        ms = slope({"lo": make(2), "hi": make(6)},
                   (params, frames, buffers))
        print(f"ring stream step in-graph: {ms:.2f} ms", flush=True)

    if "dstep" in stages:
        # in-graph cost of the steady-state DIRECT step (_stream_step_direct:
        # in-place ring-buffer attention, no context assembly).  Same
        # DCE/CSE-defeating harness as "step".
        from vda_tpu.infer.streaming import _BUF_ROWS, _pad_rows
        from vda_tpu.infer.streaming_experimental import (
            _pos_map,
            _stream_step_direct,
        )
        shapes = [(1369, 1024), (361, 1024), (1369, 256), (5476, 256)]
        buffers = []
        for bhw, c in shapes:
            bp = _pad_rows(bhw)
            buffers += [(jnp.ones((bp, _BUF_ROWS, c), jnp.bfloat16),
                         jnp.ones((bp, _BUF_ROWS, c), jnp.bfloat16))] * 2
        frames = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, (6, 518, 518, 3), np.uint8))
        pm, valid = _pos_map(list(range(31)))
        pm, valid = jnp.asarray(pm), jnp.asarray(valid)
        inner = _stream_step_direct.__wrapped__

        def make(k):
            @jax.jit
            def f(params, frames, buffers, pm, valid):
                acc = jnp.float32(0)
                for i in range(k):
                    d, _ = inner(
                        params, frames[i], buffers, pm, valid, cfg,
                        (518, 518), (518, 518), jnp.bfloat16, "auto")
                    acc = acc + d[0, 0]
                return acc
            return f

        ms = slope({"lo": make(2), "hi": make(6)},
                   (params, frames, buffers, pm, valid))
        print(f"direct stream step in-graph: {ms:.2f} ms", flush=True)

    if "gstep" in stages:
        # in-graph cost of one _stream_step_group(k=4) dispatch (4 frames).
        # Distinct frames per chained group (CSE) and a scalar consuming
        # every group's depths (DCE) — see the "step" stage comment.
        from vda_tpu.infer.streaming import (
            _BUF_ROWS,
            _CTX,
            _pad_rows,
            _stream_step_group,
        )
        shapes = [(1369, 1024), (361, 1024), (1369, 256), (5476, 256)]
        buffers = []
        for bhw, c in shapes:
            bp = _pad_rows(bhw)
            buffers += [(jnp.ones((bp, _BUF_ROWS, c), jnp.bfloat16),
                         jnp.ones((bp, _BUF_ROWS, c), jnp.bfloat16))] * 2
        frames = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, (3, 4, 518, 518, 3), np.uint8))
        # deferred-write selection format: steady-state shape — positions
        # 2..29 from buffer rows, the last 1..3 recent entries in-group.
        # One sel variant per chained group (shifted buffer rows) so frame
        # 0's buffer contraction is not CSE-shared across groups.
        from vda_tpu.infer.streaming import _ONE_HOT

        def make_sel(shift):
            sel_buf = np.zeros((4, _CTX, _ONE_HOT), np.float32)
            seljs = []
            for j in range(4):
                selj = np.zeros((_CTX, j), np.float32)
                for p in range(_CTX):
                    if j and p >= _CTX - j:
                        selj[p, p - (_CTX - j)] = 1.0
                    else:
                        sel_buf[j, p, (p + shift) % _ONE_HOT] = 1.0
                seljs.append(selj)
            return (jnp.asarray(sel_buf),
                    tuple(jnp.asarray(s) for s in seljs))

        ctxs = tuple(make_sel(i) for i in range(3))
        inner = _stream_step_group.__wrapped__

        def make(k):
            @jax.jit
            def f(params, frames, buffers, ctxs):
                acc = jnp.float32(0)
                for i in range(k):
                    d, _ = inner(
                        params, frames[i], buffers, ctxs[i], cfg,
                        (518, 518), (518, 518), jnp.bfloat16, "auto", "kv", 4)
                    acc = acc + d.sum()
                return acc
            return f

        ms = slope({"lo": make(1), "hi": make(3)},
                   (params, frames, buffers, ctxs), lo=1, hi=3)
        print(f"group(4) step in-graph: {ms:.2f} ms ({ms/4:.2f} ms/frame)",
              flush=True)

    if "enc" in stages:
        from vda_tpu.models.vda import forward_features
        x = jnp.ones((1, 1, 518, 518, 3), jnp.bfloat16)

        def make(k):
            @jax.jit
            def f(params, x):
                for _ in range(k):
                    feats = forward_features(params, x, cfg, "auto")
                    fb = feats[-1][0][0, 0, 0] * 1e-12
                    x = x + fb.astype(x.dtype)
                return x[0, 0, :1, :1, 0]
            return f

        ms = slope({"lo": make(2), "hi": make(6)}, (params, x))
        print(f"batch-1 encoder: {ms:.2f} ms", flush=True)

    if "asm" in stages:
        # one-hot context assembly over the kv buffers (the warmup path of
        # streaming._stream_step): 16 arrays (4 module shapes x 2 attn blocks
        # x k,v), each (BHW, _ONE_HOT, C) -> (BHW, 31, C)
        from vda_tpu.infer.streaming import _BUF_ROWS, _CTX, _ONE_HOT
        shapes = [(1369, 1024), (361, 1024), (1369, 256), (5476, 256)]
        bufs = []
        for bhw, c in shapes:
            bufs += [jnp.ones((bhw, _BUF_ROWS, c), jnp.bfloat16)] * 4
        idx = jnp.arange(_CTX, dtype=jnp.int32)

        def make(k):
            @jax.jit
            def f(bufs, idx):
                acc = None
                for _ in range(k):
                    sel = jax.nn.one_hot(idx, _ONE_HOT, dtype=jnp.bfloat16)
                    outs = [jnp.einsum("rt,btc->brc", sel, b[:, :_ONE_HOT])
                            for b in bufs]
                    s = sum(o[:1, :1, :1].astype(jnp.float32).sum()
                            for o in outs)
                    idx = (idx + (s * 1e-12).astype(jnp.int32)) % _ONE_HOT
                    acc = s
                return acc
            return f

        ms = slope({"lo": make(2), "hi": make(6)}, (bufs, idx))
        print(f"one-hot context assembly (16 kv buffers): {ms:.2f} ms",
              flush=True)

    if "rasm" in stages:
        # three-slice ring context assembly (streaming._stream_step_ring)
        from vda_tpu.infer.streaming import _CTX
        from vda_tpu.infer.streaming_experimental import _BUF_ROWS_RING

        shapes = [(1369, 1024), (361, 1024), (1369, 256), (5476, 256)]
        bufs = []
        for bhw, c in shapes:
            bufs += [jnp.ones((bhw, _BUF_ROWS_RING, c), jnp.bfloat16)] * 4

        def make(k):
            @jax.jit
            def f(bufs, start):
                acc = None
                for _ in range(k):
                    outs = [jnp.concatenate([
                        b[:, 0:1],
                        jax.lax.dynamic_slice_in_dim(b, start, 1, axis=1),
                        jax.lax.dynamic_slice_in_dim(b, start + 1, _CTX - 2,
                                                     axis=1)], axis=1)
                        for b in bufs]
                    s = sum(o[:1, :1, :1].astype(jnp.float32).sum()
                            for o in outs)
                    start = 1 + (start + (s * 1e-12).astype(jnp.int32)) % 40
                    acc = s
                return acc
            return f

        ms = slope({"lo": make(2), "hi": make(6)},
                   (bufs, jnp.int32(2)))
        print(f"ring-slice context assembly (16 kv buffers): {ms:.2f} ms",
              flush=True)

    if "head" in stages:
        from vda_tpu.models.vda import forward_depth, forward_features
        x = jnp.ones((1, 1, 518, 518, 3), jnp.bfloat16)
        feats0 = jax.jit(
            lambda p, x: forward_features(p, x, cfg, "auto"))(params, x)
        # 31-entry caches at the 4 module shapes x 2 attn blocks, kv mode
        # (the product streaming default)
        shapes = [(1369, 1024), (361, 1024), (1369, 256), (5476, 256)]
        caches = []
        for bhw, c in shapes:
            caches += [(jnp.ones((bhw, 31, c), jnp.bfloat16),
                        jnp.ones((bhw, 31, c), jnp.bfloat16))] * 2

        def make(k):
            @jax.jit
            def f(params, feats, caches):
                acc = jnp.float32(0)  # consume every depth (defeat DCE)
                for _ in range(k):
                    d, new = forward_depth(params, feats, (1, 1, 518, 518, 3),
                                           cfg, cached_hidden_state_list=caches,
                                           cache_kind="kv")
                    caches = [
                        tuple(jnp.concatenate([c[:, 1:], n.astype(c.dtype)],
                                              axis=1)
                              for c, n in zip(cs, ns))
                        for cs, ns in zip(caches, new)]
                    acc = acc + d[0, 0, 0].astype(jnp.float32)
                return acc
            return f

        ms = slope({"lo": make(2), "hi": make(6)}, (params, feats0, caches))
        print(f"head with 31-entry kv cache: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
