"""Opt-in int8 encoder path: kernel correctness and error bounds.

The int8 path has no reference counterpart and is NOT accuracy-validated
against real checkpoints (no egress here) — these tests bound the
quantization error per layer and end-to-end against our own bf16 pipeline.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vda_tpu.config import get_config
from vda_tpu.models import init_video_depth_anything
from vda_tpu.models.vda import forward
from vda_tpu.ops.quant import int8_linear, quantize_weight
from vda_tpu.utils.convert import cast_params_for_inference


def test_int8_linear_matches_float_within_quant_noise():
    rng = np.random.default_rng(0)
    k, n = 256, 384
    for rows in (100, 512):  # odd row count exercises the pad path
        x = jnp.asarray(rng.standard_normal((3, rows, k)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        wq, ws = quantize_weight(w)
        assert wq.dtype == jnp.int8 and ws.shape == (n,)
        y = np.asarray(int8_linear({"w_q": wq, "w_s": ws, "b": b}, x))
        ref = np.asarray(x @ w + b)
        # symmetric W8A8: error ~ (|x| |w| k^0.5) * (eps_x + eps_w),
        # eps = 1/254; measured ~3e-3 relative at these shapes
        rel = np.abs(y - ref).max() / np.abs(ref).max()
        assert rel < 2e-2, f"rows={rows}: rel={rel:.2e}"


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    wq, ws = quantize_weight(w)
    deq = np.asarray(wq, np.float32) * np.asarray(ws)[None, :]
    rel = np.abs(deq - np.asarray(w)).max() / np.abs(w).max()
    assert rel < 1.0 / 127


def test_int8_pipeline_close_to_bf16():
    """Full small model, int8 encoder vs bf16 encoder: threshold-style (δ1)
    agreement, the metric that matters for depth.  embed_dim must be a lane
    multiple (128) or the quantizer skips the weights."""
    from vda_tpu.config import EncoderConfig, ModelConfig

    vit = EncoderConfig(embed_dim=128, depth=2, num_heads=2, img_size=56)
    cfg = ModelConfig("tiny128", 32, (32, 32, 32, 32), (0, 0, 1, 1), vit,
                      num_frames=4)
    params = init_video_depth_anything(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 4, 56, 56, 3)), jnp.float32)

    p_bf = cast_params_for_inference(params)
    ref = np.asarray(forward(p_bf, x.astype(jnp.bfloat16), cfg)
                     .astype(jnp.float32))

    p_q = cast_params_for_inference(params, quant="int8")
    blk = p_q["pretrained"]["blocks"][0]
    assert "w_q" in blk["attn"]["qkv"] and "w" not in blk["attn"]["qkv"]
    out = np.asarray(forward(p_q, x.astype(jnp.bfloat16), cfg)
                     .astype(jnp.float32))

    r = ref.reshape(-1).astype(np.float64)
    o = out.reshape(-1).astype(np.float64)
    a = np.stack([o, np.ones_like(o)], 1)
    s, t = np.linalg.lstsq(a, r, rcond=None)[0]
    o = np.maximum(s * o + t, 1e-6)
    r = np.maximum(r, 1e-6)
    d1 = float((np.maximum(o / r, r / o) < 1.25).mean())
    assert d1 >= 0.99, f"int8-vs-bf16 pipeline δ1 = {d1:.4f}"


def test_int8_params_fall_back_without_mosaic(monkeypatch):
    """Quantized params must still run where no Mosaic backend exists
    (plain CPU, or VDA_DISABLE_PALLAS=1): linear() dequantizes and takes
    the XLA matmul path instead of crashing in pallas lowering."""
    from vda_tpu.ops.layers import linear

    monkeypatch.delenv("VDA_PALLAS_INTERPRET", raising=False)
    # this machine HAS a (tunneled) TPU plugin, so force the no-Mosaic case
    monkeypatch.setenv("VDA_DISABLE_PALLAS", "1")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 17, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 256)) * 0.1, jnp.float32)
    wq, ws = quantize_weight(w)
    y = np.asarray(linear({"w_q": wq, "w_s": ws}, x))
    ref = np.asarray(x @ w)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-2


def test_pallas_killswitch_is_live(monkeypatch):
    """VDA_DISABLE_PALLAS must take effect mid-process: the device probe is
    cached, the env check must NOT be (regression: the check was originally
    inside the lru_cache, making the engine CPU tier's kill-switch a no-op
    after any earlier TPU-tier trace)."""
    from vda_tpu.ops import attention as A

    monkeypatch.setattr(A, "_tpu_present", lambda: True)
    monkeypatch.delenv("VDA_DISABLE_PALLAS", raising=False)
    assert A._on_tpu() is True
    monkeypatch.setenv("VDA_DISABLE_PALLAS", "1")
    assert A._on_tpu() is False
    monkeypatch.delenv("VDA_DISABLE_PALLAS", raising=False)
    assert A._on_tpu() is True


def test_head_params_never_quantized():
    # must use a lane-aligned width or NOTHING quantizes and the test is
    # vacuous (embed 64 fails the %128 guard)
    from vda_tpu.config import EncoderConfig, ModelConfig

    vit = EncoderConfig(embed_dim=128, depth=2, num_heads=2, img_size=56)
    cfg = ModelConfig("tiny128", 32, (32, 32, 32, 32), (0, 0, 1, 1), vit,
                      num_frames=4)
    params = init_video_depth_anything(jax.random.PRNGKey(2), cfg)
    p_q = cast_params_for_inference(params, quant="int8")
    enc_leaves = jax.tree_util.tree_leaves(p_q["pretrained"])
    assert any(l.dtype == jnp.int8 for l in enc_leaves)  # quantizer engaged
    head_leaves = jax.tree_util.tree_leaves(p_q["head"])
    assert all(l.dtype != jnp.int8 for l in head_leaves)
