"""Numerical parity of core ops vs torch / cv2 semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_torch
from vda_tpu.ops.layers import (
    conv2d,
    conv_transpose_same_stride,
    gelu,
    group_norm,
    layer_norm,
)
from vda_tpu.ops.resize import resize_bicubic, resize_bilinear

RNG = np.random.default_rng(0)


@requires_torch
class TestResize:
    def test_bilinear_align_corners_matches_torch(self):
        import torch
        import torch.nn.functional as F

        x = RNG.standard_normal((2, 17, 23, 5)).astype(np.float32)
        for out_hw in [(34, 46), (37, 37), (100, 50), (9, 11)]:
            ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw,
                                              align_corners=True))
            theirs = F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
                mode="bilinear", align_corners=True,
            ).permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

    def test_bilinear_scale2_matches_torch(self):
        import torch
        import torch.nn.functional as F

        x = RNG.standard_normal((1, 13, 13, 4)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), (26, 26),
                                          align_corners=True))
        theirs = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
            mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

    def test_bilinear_pallas_fused_matches_matmul_form(self, monkeypatch):
        # The fused Pallas upsample (ops/pallas_resize, interpret mode here)
        # must match the fp32 separable ground truth to bf16 precision at
        # shapes the `supported` gate admits (bf16, C%128==0, upscale,
        # H_out divisible by a row block).  The kernel is opt-in (it loses
        # the full window to XLA overlap; see ops/pallas_resize._disabled).
        monkeypatch.setenv("VDA_RESIZE_KERNEL", "1")
        from vda_tpu.ops import pallas_resize

        for shape, out_hw in [((8, 20, 24, 128), (32, 40)),
                              ((8, 148, 16, 128), (296, 28)),
                              ((9, 9, 7, 256), (14, 13))]:
            x32 = RNG.standard_normal(shape).astype(np.float32)
            x = jnp.asarray(x32, jnp.bfloat16)
            assert pallas_resize.supported(x, out_hw, True, None)
            got = np.asarray(pallas_resize.resize_bilinear_fused(
                x, out_hw)).astype(np.float32)
            ref = np.asarray(resize_bilinear(
                jnp.asarray(np.asarray(x, np.float32)), out_hw,
                align_corners=True))
            np.testing.assert_allclose(got, ref, rtol=0.02, atol=0.02)
            # and resize_bilinear itself dispatches to the kernel
            via = np.asarray(resize_bilinear(x, out_hw,
                                             align_corners=True)
                             ).astype(np.float32)
            np.testing.assert_array_equal(got, via)

    def test_bilinear_pallas_gate_rejections(self, monkeypatch):
        monkeypatch.setenv("VDA_RESIZE_KERNEL", "1")
        from vda_tpu.ops import pallas_resize

        ok = jnp.ones((8, 20, 24, 128), jnp.bfloat16)
        assert pallas_resize.supported(ok, (32, 40), True, None)
        assert not pallas_resize.supported(       # fp32 input
            jnp.ones((8, 20, 24, 128), jnp.float32), (32, 40), True, None)
        assert not pallas_resize.supported(       # lanes not 128-aligned
            jnp.ones((8, 20, 24, 64), jnp.bfloat16), (32, 40), True, None)
        assert not pallas_resize.supported(       # batch-1 (streaming) loses
            jnp.ones((1, 20, 24, 128), jnp.bfloat16), (32, 40), True, None)
        assert not pallas_resize.supported(ok, (10, 40), True, None)  # down
        assert not pallas_resize.supported(ok, (32, 40), False, None)
        assert not pallas_resize.supported(ok, (32, 40), True, (2.0, 2.0))
        assert not pallas_resize.supported(ok, (37, 40), True, None)  # block

    def test_bilinear_gather_matches_matmul_form(self):
        from vda_tpu.ops.resize import resize_bilinear_gather

        x = RNG.standard_normal((2, 17, 23, 5)).astype(np.float32)
        for out_hw in [(34, 46), (37, 37), (100, 50), (9, 11)]:
            for ac in (True, False):
                a = np.asarray(resize_bilinear(jnp.asarray(x), out_hw,
                                               align_corners=ac))
                b = np.asarray(resize_bilinear_gather(jnp.asarray(x), out_hw,
                                                      align_corners=ac))
                np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_bicubic_halfpixel_matches_torch(self):
        import torch
        import torch.nn.functional as F

        x = RNG.standard_normal((1, 37, 37, 8)).astype(np.float32)
        for out_hw in [(74, 74), (19, 19), (52, 52)]:
            ours = np.asarray(resize_bicubic(jnp.asarray(x), out_hw,
                                             align_corners=False))
            theirs = F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
                mode="bicubic", align_corners=False,
            ).permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_bicubic_explicit_scale_matches_torch_posembed_path(self):
        # Reference dinov2.py:198-205: interpolate(scale_factor=(sx, sy)),
        # where sx = (w0 + 0.1) / sqrt(N).
        import torch
        import torch.nn.functional as F

        side, d = 37, 16
        x = RNG.standard_normal((1, side, side, d)).astype(np.float32)
        for grid in [(24, 24), (30, 40)]:
            sh = (grid[0] + 0.1) / side
            sw = (grid[1] + 0.1) / side
            ours = np.asarray(resize_bicubic(jnp.asarray(x), grid,
                                             align_corners=False,
                                             scale=(sh, sw)))
            theirs = F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                scale_factor=(sh, sw), mode="bicubic",
            ).permute(0, 2, 3, 1).numpy()
            assert theirs.shape == ours.shape
            np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_bicubic_matches_cv2(self):
        import cv2

        x = (RNG.random((63, 91, 3)) * 255).astype(np.float32)
        for out_hw in [(518, 742), (126, 182)]:
            ours = np.asarray(resize_bicubic(jnp.asarray(x), out_hw))
            theirs = cv2.resize(x, (out_hw[1], out_hw[0]),
                                interpolation=cv2.INTER_CUBIC)
            np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-2)


@requires_torch
class TestLayers:
    def test_layer_norm(self):
        import torch

        d = 48
        x = RNG.standard_normal((3, 7, d)).astype(np.float32)
        scale = RNG.standard_normal(d).astype(np.float32)
        bias = RNG.standard_normal(d).astype(np.float32)
        ours = np.asarray(layer_norm({"scale": jnp.asarray(scale),
                                      "bias": jnp.asarray(bias)},
                                     jnp.asarray(x), eps=1e-6))
        ln = torch.nn.LayerNorm(d, eps=1e-6)
        ln.weight.data = torch.from_numpy(scale)
        ln.bias.data = torch.from_numpy(bias)
        theirs = ln(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

    def test_group_norm(self):
        import torch

        c, g = 64, 32
        x = RNG.standard_normal((2, 5, 6, c)).astype(np.float32)
        scale = RNG.standard_normal(c).astype(np.float32)
        bias = RNG.standard_normal(c).astype(np.float32)
        ours = np.asarray(group_norm({"scale": jnp.asarray(scale),
                                      "bias": jnp.asarray(bias)},
                                     jnp.asarray(x), g, eps=1e-6))
        gn = torch.nn.GroupNorm(g, c, eps=1e-6)
        gn.weight.data = torch.from_numpy(scale)
        gn.bias.data = torch.from_numpy(bias)
        theirs = gn(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).detach().numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_gelu_exact(self):
        import torch

        x = np.linspace(-4, 4, 101).astype(np.float32)
        ours = np.asarray(gelu(jnp.asarray(x)))
        theirs = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)

    def test_conv2d_matches_torch(self):
        import torch

        cin, cout = 8, 16
        x = RNG.standard_normal((2, 9, 9, cin)).astype(np.float32)
        w = RNG.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.1
        b = RNG.standard_normal(cout).astype(np.float32)
        p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
             "b": jnp.asarray(b)}
        for stride, pad in [(1, 1), (2, 1)]:
            ours = np.asarray(conv2d(p, jnp.asarray(x), stride=stride,
                                     padding=pad))
            theirs = torch.nn.functional.conv2d(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                torch.from_numpy(w), torch.from_numpy(b),
                stride=stride, padding=pad,
            ).permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_conv2d_s2d_matches_plain(self):
        from vda_tpu.ops.layers import conv2d_3x3_s2d, init_conv2d

        import jax

        key = jax.random.PRNGKey(3)
        p = init_conv2d(key, 3, 12, 5)
        x = jnp.asarray(RNG.standard_normal((2, 16, 10, 12)).astype(np.float32))
        a = np.asarray(conv2d(p, x, padding=1))
        b = np.asarray(conv2d_3x3_s2d(p, x))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
        # bf16 operands with fp32 accumulation (the output-island form)
        a32 = np.asarray(conv2d(p, x.astype(jnp.bfloat16), padding=1,
                                accumulate_fp32=True))
        b32 = np.asarray(conv2d_3x3_s2d(p, x.astype(jnp.bfloat16),
                                        accumulate_fp32=True))
        np.testing.assert_allclose(a32, b32, rtol=1e-2, atol=1e-2)

    @pytest.mark.parametrize("k", [2, 4])
    def test_conv_transpose_same_stride_matches_torch(self, k):
        import torch

        cin, cout = 6, 10
        x = RNG.standard_normal((2, 5, 7, cin)).astype(np.float32)
        w = RNG.standard_normal((cin, cout, k, k)).astype(np.float32) * 0.1
        b = RNG.standard_normal(cout).astype(np.float32)
        p = {"w": jnp.asarray(np.transpose(w, (0, 2, 3, 1))),
             "b": jnp.asarray(b)}
        ours = np.asarray(conv_transpose_same_stride(p, jnp.asarray(x), k))
        theirs = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w), torch.from_numpy(b), stride=k,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


class TestAttention:
    def test_xla_attention_reference(self):
        from vda_tpu.ops.attention import dot_product_attention

        b, n, h, d = 2, 10, 3, 8
        q = jnp.asarray(RNG.standard_normal((b, n, h, d)).astype(np.float32))
        k = jnp.asarray(RNG.standard_normal((b, n, h, d)).astype(np.float32))
        v = jnp.asarray(RNG.standard_normal((b, n, h, d)).astype(np.float32))
        out = dot_product_attention(q, k, v, impl="xla")
        # naive reference
        scale = d ** -0.5
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        ref = np.einsum("bhqk,bkhd->bqhd", probs, v)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_pallas_resize_fused_grad(monkeypatch):
    """The opt-in fused resize kernel must be differentiable (custom VJP
    running the XLA separable reference backward)."""
    import jax
    import jax.numpy as jnp

    monkeypatch.setenv("VDA_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VDA_RESIZE_KERNEL", "1")
    from vda_tpu.ops import pallas_resize
    from vda_tpu.ops.resize import _apply_separable, _linear_matrix

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 14, 14, 128),
                          jnp.float32).astype(jnp.bfloat16)
    out_hw = (28, 28)
    assert pallas_resize.supported(x, out_hw, True, None)

    def loss_fused(x):
        return jnp.sum(pallas_resize.resize_bilinear_fused(x, out_hw)
                       .astype(jnp.float32) ** 2)

    def loss_ref(x):
        y = _apply_separable(x, _linear_matrix(14, 28, True, None),
                             _linear_matrix(14, 28, True, None))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused)(x).astype(jnp.float32)
    g_ref = jax.grad(loss_ref)(x).astype(jnp.float32)
    import numpy as np
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-2, atol=5e-2)
