"""Pallas fused bilinear upsample (2-tap H-lerp + in-VMEM W matmul).

The DPT output tail upsamples (B, 296, 296, 128) -> (B, 518, 518, 128)
(reference dpt_temporal.py:105 F.interpolate before output_conv2).  The
XLA matmul form (ops/resize._apply_separable) runs the W-pass as B*518
tiny (518, 296) @ (296, 128) batched slices — measured ~49 TF/s, ~15 ms of
a 354 ms vitl window.  Gather, band-blocked-matmul, transposed-layout and
pass-order-swap forms all measured worse (CLAUDE.md dead-end ledger).

This kernel exploits that the H axis of an NHWC array is an OUTER dim on
TPU (tiling only constrains the minor (W, C) pair): each grid step DMAs an
arbitrary-offset input row band (``pl.Element`` indexing, scalar-prefetched
band starts), lerps the 2-tap H interpolation on the VPU in fp32, and runs
the W-pass as per-row (W_out, W_in) @ (W_in, C) MXU matmuls entirely in
VMEM.  The (B, H_out, W_in, C) intermediate of the separable form never
touches HBM: traffic drops from read+write of both intermediate and output
(~4.7 GB per vitl window) to read-input + write-output (~2.9 GB), and the
H-pass costs 3 VPU flops/element instead of a dense matmul.

STATUS — measured artifact, OFF by default.  Isolated the kernel wins both
engaged window shapes (island 296->518 C=128 B=32: 10.86->8.19 ms;
refinenet1 148->296 C=256 B=32: 6.46->4.77 ms; scripts/bench_resize.py),
but the FULL window regresses 355.5->360.1 ms p50 (interleaved same-process
A/B, scripts/ab_resize_window.py): XLA overlaps the separable form's many
small matmuls with adjacent conv work, and a pallas_call is a scheduling
barrier that serializes ~6 ms of overlap to save ~4.4 ms of kernel time.
At batch 1 (streaming) the kernel is also slower standalone (~+1.5 ms).
Opt in with VDA_RESIZE_KERNEL=1.

Numerics: identical taps/weights as ops/resize (same _lerp_tables), H-lerp
in fp32 (the XLA bf16 path rounds the lerp weights to bf16; this kernel is
the strictly more accurate side of that coin), W matmul bf16 x bf16 with
fp32 accumulation — the same contraction the XLA path runs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vda_tpu.ops.resize import _lerp_tables, _linear_matrix


def _interpret() -> bool:
    return os.environ.get("VDA_PALLAS_INTERPRET", "0") == "1"


def _disabled() -> bool:
    # OFF by default: the kernel wins ISOLATED at the window's two engaged
    # shapes (island 10.86->8.19 ms, refinenet1 6.46->4.77 ms at B=32) but
    # LOSES the full window (interleaved same-process A/B: 360.1 vs 355.5 ms
    # p50, scripts/ab_resize_window.py) — XLA overlaps the small resize
    # matmuls with neighboring conv work, and the Pallas call serializes
    # that overlap.  VDA_RESIZE_KERNEL=1 opts in (read at trace time).
    return (os.environ.get("VDA_DISABLE_PALLAS", "0") == "1"
            or os.environ.get("VDA_RESIZE_KERNEL", "0") != "1")


@functools.lru_cache(maxsize=64)
def _plan(in_h: int, out_h: int, block_rows: int):
    """Host-side tables: band start per row-block, in-band taps per out row.

    Returns (band, starts (nblk,), loc0 (out_h,), loc1 (out_h,), w1 (out_h,))
    with band the fixed input-band height covering every block's tap span.
    """
    i0, i1, w1 = _lerp_tables(in_h, out_h, True, None)
    nblk = out_h // block_rows
    spans = []
    for blk in range(nblk):
        r0, r1 = blk * block_rows, (blk + 1) * block_rows - 1
        spans.append(int(i1[r1]) - int(i0[r0]) + 1)
    band = min(max(spans), in_h)
    starts = np.empty((nblk,), np.int32)
    for blk in range(nblk):
        s = min(int(i0[blk * block_rows]), in_h - band)
        starts[blk] = s
    blk_of = np.arange(out_h) // block_rows
    loc0 = (i0 - starts[blk_of]).astype(np.int32)
    loc1 = (i1 - starts[blk_of]).astype(np.int32)
    assert loc0.min() >= 0 and loc1.max() < band
    return band, starts, loc0, loc1, w1.astype(np.float32)


def _resize_kernel(s_tab, x_ref, mw_ref, loc0_ref, loc1_ref, w1_ref, o_ref,
                   *, block_rows: int):
    mw = mw_ref[...]         # (W_out, W_in) bf16
    ri = pl.program_id(1)
    for j in range(block_rows):
        # dynamic row loads from the VMEM band ref (H is an untiled dim, so
        # arbitrary starts are legal); dynamic_slice on a loaded VALUE is not
        # lowerable on TPU
        r0 = x_ref[0, pl.ds(loc0_ref[ri, j], 1)][0].astype(jnp.float32)
        r1 = x_ref[0, pl.ds(loc1_ref[ri, j], 1)][0].astype(jnp.float32)
        t = w1_ref[ri, j]
        row = (r0 * (1.0 - t) + r1 * t).astype(jnp.bfloat16)  # (W_in, C)
        res = jax.lax.dot_general(
            mw, row, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (W_out, C)
        o_ref[0, j] = res.astype(o_ref.dtype)


def supported(x, out_hw, align_corners: bool, scale) -> bool:
    """This kernel covers the island's case: bf16 NHWC upsample with
    align_corners=True, lane-aligned channels, H_out divisible by a usable
    row block, and a batch big enough that the kernel's serial grid beats
    XLA's overlapped small-matmul schedule (measured: B=32 wins 8.19 vs
    10.86 ms isolated at the island shape; B=1 LOSES ~1.5 ms/frame inside
    the streaming step — the per-frame matmuls hide under overlap there)."""
    if _disabled() or scale is not None or not align_corners:
        return False
    if x.ndim != 4 or x.dtype != jnp.bfloat16 or x.shape[0] < 8:
        return False
    h, w, c = x.shape[1], x.shape[2], x.shape[3]
    oh, ow = out_hw
    if c % 128 != 0 or oh < h or ow < w:
        return False
    return _pick_block(oh) is not None


def _pick_block(out_h: int):
    for br in (16, 14, 8, 7):
        if out_h % br == 0:
            return br
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def resize_bilinear_fused(x, out_hw):
    """(B, H, W, C) bf16 -> (B, H_out, W_out, C) bf16, align_corners=True.

    Caller must check ``supported`` first.  Differentiable: the backward
    pass runs the XLA separable-matmul reference (pallas_call itself has no
    VJP rule — same pattern as ops/pallas_norm.fused_layer_norm), so the
    opt-in kernel is safe even if it ever engages under a training trace.
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    br = _pick_block(oh)
    band, starts, loc0, loc1, w1 = _plan(h, oh, br)
    mw = jnp.asarray(_linear_matrix(w, ow, True, None)).astype(jnp.bfloat16)
    grid = (b, oh // br)
    kernel = functools.partial(_resize_kernel, block_rows=br)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(1), pl.Element(band), pl.Element(w),
                     pl.Element(c)),
                    lambda bi, ri, s_tab: (bi, s_tab[ri], 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec((ow, w), lambda bi, ri, s_tab: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # loc0 (nblk, br)
                pl.BlockSpec(memory_space=pltpu.SMEM),  # loc1 (nblk, br)
                pl.BlockSpec(memory_space=pltpu.SMEM),  # w1   (nblk, br)
            ],
            out_specs=pl.BlockSpec(
                (1, br, ow, c), lambda bi, ri, s_tab: (bi, ri, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, c), x.dtype),
        interpret=_interpret(),
    )(jnp.asarray(starts), x, mw,
      jnp.asarray(loc0.reshape(-1, br)), jnp.asarray(loc1.reshape(-1, br)),
      jnp.asarray(w1.reshape(-1, br)))


def _rbf_fwd(x, out_hw):
    return resize_bilinear_fused(x, out_hw), x


def _rbf_bwd(out_hw, x, g):
    from vda_tpu.ops.resize import _apply_separable, _linear_matrix

    h, w = x.shape[-3], x.shape[-2]

    def ref(x):
        return _apply_separable(
            x,
            _linear_matrix(h, out_hw[0], True, None),
            _linear_matrix(w, out_hw[1], True, None))

    _, vjp = jax.vjp(ref, x)
    return vjp(g)


resize_bilinear_fused.defvjp(_rbf_fwd, _rbf_bwd)
