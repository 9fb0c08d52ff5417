#!/usr/bin/env python
"""Decompose the output tail (refinenet2/1 + output convs) at vitl shape.

    python scripts/bench_tail.py rf2 rf1
    python scripts/bench_tail.py oc island
    python scripts/bench_tail.py mm3
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


def slope(make_fn, params, x, lo=2, hi=6, reps=3):
    fns = {"lo": jax.jit(make_fn(lo)), "hi": jax.jit(make_fn(hi))}
    out = {}
    for name, f in fns.items():
        sync(f(params, x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(params, x))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        out[name] = ts[len(ts) // 2]
    return (out["hi"] - out["lo"]) / (hi - lo) * 1e3


def main():
    stages = sys.argv[1:] or ["rf2"]
    from vda_tpu.config import get_config
    from vda_tpu.models import dpt
    from vda_tpu.ops.resize import resize_bilinear
    from vda_tpu.utils.convert import cast_params_for_inference

    cfg = get_config("vitl")
    key = jax.random.PRNGKey(0)
    p = cast_params_for_inference(
        {"head": dpt.init_dpt_head(key, cfg, temporal=True)})["head"]

    def feedback(x, scalar):
        return x + scalar.astype(x.dtype) * 1e-12

    if "rf2" in stages:
        p3 = jax.random.normal(key, (16, 74, 74, 256), jnp.bfloat16)
        l2 = jax.random.normal(key, (16, 74, 74, 256), jnp.bfloat16)

        def make(k):
            def f(p, args):
                p3, l2 = args
                out = None
                for _ in range(k):
                    out = dpt._fusion(p["refinenet2"], p3, l2, size=(148, 148))
                    p3 = feedback(p3, out[0, 0, 0, 0])
                return out[0, :1, :1, :1]
            return f

        ms = slope(make, p, (p3, l2))
        print(f"refinenet2 (mb16 chunk): {ms:.2f} ms  x2 = {2*ms:.1f}", flush=True)

    if "rf1" in stages:
        p2 = jax.random.normal(key, (16, 148, 148, 256), jnp.bfloat16)
        l1 = jax.random.normal(key, (16, 148, 148, 256), jnp.bfloat16)

        def make(k):
            def f(p, args):
                p2, l1 = args
                out = None
                for _ in range(k):
                    out = dpt._fusion(p["refinenet1"], p2, l1)
                    p2 = feedback(p2, out[0, 0, 0, 0])
                return out[0, :1, :1, :1]
            return f

        ms = slope(make, p, (p2, l1))
        print(f"refinenet1 (mb16 chunk): {ms:.2f} ms  x2 = {2*ms:.1f}", flush=True)

    if "oc" in stages:
        p1 = jax.random.normal(key, (16, 296, 296, 256), jnp.bfloat16)

        def make(k):
            def f(p, p1):
                out = None
                for _ in range(k):
                    out = dpt.conv2d(p["output_conv1"], p1, padding=1)
                    p1 = feedback(p1, out[0, 0, 0, 0])
                return out[0, :1, :1, :1]
            return f

        ms = slope(make, p, p1)
        print(f"output_conv1 296^2 256->128: {ms:.2f} ms  x2 = {2*ms:.1f}", flush=True)

    if "island" in stages:
        x = jax.random.normal(key, (16, 296, 296, 128), jnp.bfloat16)

        def make(k):
            def f(p, x):
                out = None
                for _ in range(k):
                    up = resize_bilinear(x, (518, 518), align_corners=True)
                    o32 = jax.nn.relu(dpt.conv2d(
                        p["output_conv2"]["conv0"], up, padding=1,
                        accumulate_fp32=True))
                    out = jax.nn.relu(dpt.conv2d(
                        p["output_conv2"]["conv1"], o32, padding=0))
                    x = feedback(x, out[0, 0, 0, 0])
                return out[0, :1, :1, :1]
            return f

        ms = slope(make, p, x)
        print(f"resize+island 518^2: {ms:.2f} ms  x2 = {2*ms:.1f}", flush=True)

    if "oc2" in stages:
        # output_conv1 as 9 shifted matmuls vs lax conv (113 TF/s measured)
        p1 = jax.random.normal(key, (16, 296, 296, 256), jnp.bfloat16)
        w = p["output_conv1"]["w"]   # (3,3,256,128)
        bias = p["output_conv1"]["b"]

        def conv9(p, x):
            b_, h, ww_, ci = x.shape
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = None
            for u in range(3):
                for v_ in range(3):
                    t = jax.lax.dynamic_slice(
                        xp, (0, u, v_, 0), (b_, h, ww_, ci))
                    y = jnp.matmul(t, p["output_conv1"]["w"][u, v_].astype(x.dtype))
                    acc = y if acc is None else acc + y
            return acc + p["output_conv1"]["b"].astype(acc.dtype)

        def mk(fn):
            def make(k):
                def f(p, x):
                    out = None
                    for _ in range(k):
                        out = fn(p, x)
                        x = feedback(x, out[0, 0, 0, 0])
                    return out[0, :1, :1, :1]
                return f
            return make

        ms = slope(mk(lambda p, x: dpt.conv2d(p["output_conv1"], x, padding=1)), p, p1)
        print(f"oc lax conv: {ms:.2f} ms", flush=True)
        ms = slope(mk(conv9), p, p1)
        print(f"oc 9-matmul: {ms:.2f} ms", flush=True)

    if "island2" in stages:
        from vda_tpu.ops.layers import conv2d_3x3_s2d
        from vda_tpu.ops.resize import resize_bilinear_gather
        x = jax.random.normal(key, (16, 296, 296, 128), jnp.bfloat16)

        def mk(resize_fn, conv0_fn, conv1_fn):
            def make(k):
                def f(p, x):
                    out = None
                    for _ in range(k):
                        up = resize_fn(x)
                        o32 = jax.nn.relu(conv0_fn(p, up))
                        out = jax.nn.relu(conv1_fn(p, o32))
                        x = feedback(x, out[0, 0, 0, 0])
                    return out[0, :1, :1, :1]
                return f
            return make

        rs_mm = lambda x: resize_bilinear(x, (518, 518), align_corners=True)
        rs_g = lambda x: resize_bilinear_gather(x, (518, 518),
                                                align_corners=True)
        c0 = lambda p, u: dpt.conv2d(p["output_conv2"]["conv0"], u, padding=1,
                                     accumulate_fp32=True)
        c0s = lambda p, u: conv2d_3x3_s2d(p["output_conv2"]["conv0"], u,
                                          accumulate_fp32=True)
        c1 = lambda p, o: dpt.conv2d(p["output_conv2"]["conv1"], o, padding=0)
        def c1v(p, o):
            w = p["output_conv2"]["conv1"]["w"][0, 0, :, 0]
            b = p["output_conv2"]["conv1"]["b"]
            return (jnp.einsum("bhwc,c->bhw", o, w) + b)[..., None]

        for name, variant in [
            ("mm-resize + s2d conv0", mk(rs_mm, c0s, c1)),
            ("gather-resize + s2d conv0", mk(rs_g, c0s, c1)),
            ("gather-resize + s2d + vpu conv1", mk(rs_g, c0s, c1v)),
            ("gather-resize + plain conv0", mk(rs_g, c0, c1)),
        ]:
            ms = slope(variant, p, x)
            print(f"island [{name}]: {ms:.2f} ms  x2 = {2*ms:.1f}", flush=True)

    if "island3" in stages:
        # resize formulation A/B inside the island: current separable
        # einsums vs H-pass-only form with a W<->H transpose sandwich
        from vda_tpu.ops.layers import conv2d_3x3_s2d
        from vda_tpu.ops.resize import _linear_matrix
        x = jax.random.normal(key, (16, 296, 296, 128), jnp.bfloat16)
        mh = jnp.asarray(_linear_matrix(296, 518, True)).astype(jnp.bfloat16)

        def rs_cur(z):
            return resize_bilinear(z, (518, 518), align_corners=True)

        def rs_tr(z):
            zt = z.transpose(0, 2, 1, 3)
            y = jnp.einsum("pw,bwhc->bphc", mh, zt,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
            y2 = jnp.einsum("oh,bphc->bpoc", mh, y,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            return y2.transpose(0, 2, 1, 3)

        def mk(resize_fn):
            def make(k):
                def f(p, x):
                    out = None
                    for _ in range(k):
                        up = resize_fn(x)
                        o32 = jax.nn.relu(conv2d_3x3_s2d(
                            p["output_conv2"]["conv0"], up,
                            accumulate_fp32=True))
                        out = jax.nn.relu(dpt.conv2d(
                            p["output_conv2"]["conv1"], o32, padding=0))
                        x = feedback(x, out[0, 0, 0, 0])
                    return out[0, :1, :1, :1]
                return f
            return make

        for name, rf in (("current separable", rs_cur),
                         ("transpose sandwich", rs_tr)):
            ms = slope(mk(rf), p, x)
            print(f"island3 [{name}]: {ms:.2f} ms  x2 = {2*ms:.1f}",
                  flush=True)

    if "ocs2d" in stages:
        # output_conv1 (3x3, 256->128, 296^2) in s2d form vs plain lax conv
        from vda_tpu.ops.layers import conv2d_3x3_s2d
        p1 = jax.random.normal(key, (16, 296, 296, 256), jnp.bfloat16)

        def mk(fn):
            def make(k):
                def f(p, x):
                    out = None
                    for _ in range(k):
                        out = fn(p, x)
                        x = feedback(x, out[0, 0, 0, 0])
                    return out[0, :1, :1, :1]
                return f
            return make

        ms = slope(mk(lambda p, x: dpt.conv2d(p["output_conv1"], x,
                                              padding=1)), p, p1)
        print(f"output_conv1 lax conv: {ms:.2f} ms  x2 = {2*ms:.1f}", flush=True)
        ms = slope(mk(lambda p, x: conv2d_3x3_s2d(p["output_conv1"], x)), p, p1)
        print(f"output_conv1 s2d form: {ms:.2f} ms  x2 = {2*ms:.1f}", flush=True)

    if "mm3parts" in stages:
        from vda_tpu.models import temporal as T
        from vda_tpu.ops.layers import group_norm, layer_norm, linear
        pm = p["motion_modules"][3]
        bd, t, c = 5476, 32, 256
        key2 = jax.random.PRNGKey(1)

        x_img = jax.random.normal(key2, (32, 74, 74, c), jnp.bfloat16)

        def mk_gn(k):
            def f(pm, x):
                for _ in range(k):
                    x = group_norm(pm["norm"], x, cfg.norm_num_groups,
                                   eps=1e-6).astype(x.dtype)
                return x[0, :1, :1, :1]
            return f
        print(f"gn (32,74,74,256): {slope(mk_gn, pm, x_img):.2f} ms", flush=True)

        x_btdc = jax.random.normal(key2, (1, t, bd, c), jnp.bfloat16)

        def mk_tr(k):
            def f(pm, x):
                for _ in range(k):
                    h = x.transpose(0, 2, 1, 3).reshape(bd, t, c)
                    x = h.reshape(1, bd, t, c).transpose(0, 2, 1, 3)
                return x[0, :1, :1, :1]
            return f
        print(f"transpose pair (1,32,5476,256): {slope(mk_tr, pm, x_btdc):.2f} ms",
              flush=True)

        h_seq = jax.random.normal(key2, (bd, t, c), jnp.bfloat16)
        blk = pm["blocks"][0]

        def mk_attn(k):
            def f(blk, h):
                for _ in range(k):
                    hn = layer_norm(blk["norms"][0], h, eps=1e-5)
                    out, _ = T._temporal_attention(blk["attn"][0], hn, cfg, None)
                    h = out + h
                return h[0, :1, :1]
            return f
        print(f"one attention block (5476,32,256): {slope(mk_attn, blk, h_seq):.2f} ms",
              flush=True)

        def mk_ff(k):
            def f(blk, h):
                for _ in range(k):
                    hn = layer_norm(blk["ff_norm"], h, eps=1e-5)
                    x12 = linear(blk["ff"]["proj"], hn)
                    x1, gate = jnp.split(x12, 2, axis=-1)
                    from vda_tpu.ops.layers import gelu
                    h = linear(blk["ff"]["out"], x1 * gelu(gate)) + h
                return h[0, :1, :1]
            return f
        print(f"GEGLU FF (5476,32,256): {slope(mk_ff, blk, h_seq):.2f} ms",
              flush=True)

        def mk_proj(k):
            def f(pm, h):
                for _ in range(k):
                    h = linear(pm["proj_in"], h)
                return h[0, :1, :1]
            return f
        print(f"proj_in matmul: {slope(mk_proj, pm, h_seq):.2f} ms", flush=True)

    if "tiles" in stages:
        from vda_tpu.ops.pallas_attention import tiny_seq_attention
        bd, t, c = 5476, 32, 256
        key2 = jax.random.PRNGKey(1)
        q = jax.random.normal(key2, (bd, t, c), jnp.bfloat16)
        kk = jax.random.normal(key2, (bd, t, c), jnp.bfloat16)
        vv = jax.random.normal(key2, (bd, t, c), jnp.bfloat16)

        for rpt in (64, 128, 256, 512):
            def make(k, rpt=rpt):
                def f(_, args):
                    q, kk, vv = args
                    for _ in range(k):
                        o = tiny_seq_attention(q, kk, vv, heads=8, seq=t,
                                               scale=32 ** -0.5,
                                               rows_per_tile=rpt)
                        q = q + o[0, 0, 0] * 1e-12
                    return q[0, :1, :1]
                return f

            ms = slope(make, None, (q, kk, vv))
            print(f"tiny_seq rows_per_tile={rpt}: {ms:.2f} ms", flush=True)

    if "mm3" in stages:
        from vda_tpu.models.temporal import temporal_module_apply
        x = jax.random.normal(key, (1, 32, 74, 74, 256), jnp.bfloat16)
        pm = p["motion_modules"][3]

        def make(k):
            def f(pm, x):
                for _ in range(k):
                    x, _ = temporal_module_apply(pm, x, cfg, None)
                return x[0, 0, :1, :1, :1]
            return f

        ms = slope(make, pm, x)
        print(f"mm3 fused-qkv: {ms:.2f} ms", flush=True)

    if "mm3f" in stages:
        from vda_tpu.models.temporal import temporal_module_apply
        import vda_tpu.ops.pallas_temporal as PT
        x = jax.random.normal(key, (1, 32, 74, 74, 256), jnp.bfloat16)
        pm = p["motion_modules"][3]

        for rpt in ([int(a) for a in sys.argv[2:] if a.isdigit()] or [512]):
            PT._RPT_OVERRIDE = rpt

            def make(k):
                def f(pm, x):
                    for _ in range(k):
                        x, _ = temporal_module_apply(pm, x, cfg, None,
                                                     need_caches=False)
                    return x[0, 0, :1, :1, :1]
                return f

            ms = slope(make, pm, x)
            print(f"mm3 FUSED-BLOCK kernel (rpt={rpt}): {ms:.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
