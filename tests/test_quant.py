"""int8 Pallas matmul kernel: correctness and error bounds.

The int8 path was DEMOTED out of the inference hot path in round 3 (it
measured ~0.9% end-to-end at vitl with accuracy unvalidatable offline —
see ops/quant.py and scripts/bench_int8_pallas.py for the measured result).
The kernel library remains, tested here at the kernel level; there is no
model-level dispatch anymore (ops/layers.linear is quantization-free).
"""

import numpy as np

import jax.numpy as jnp

from vda_tpu.ops.quant import int8_linear, quantize_weight


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


def test_int8_linear_unaligned_width_blocks():
    """n not divisible by the default block must pick a smaller 128-multiple
    divisor, not fall back to one full-width VMEM block (ADVICE r2)."""
    rng = np.random.default_rng(4)
    k, n = 256, 640  # 640 = 5*128, not divisible by the default bn=512
    x = jnp.asarray(rng.standard_normal((256, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    wq, ws = quantize_weight(w)
    y = np.asarray(int8_linear({"w_q": wq, "w_s": ws}, x))
    ref = np.asarray(x @ w)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-2


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    wq, ws = quantize_weight(w)
    deq = np.asarray(wq, np.float32) * np.asarray(ws)[None, :]
    rel = np.abs(deq - np.asarray(w)).max() / np.abs(w).max()
    assert rel < 1.0 / 127


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
