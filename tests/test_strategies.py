"""Engine strategy tiers, stabilization, upscaling, profiling utilities."""

import numpy as np

from apps.engine.strategies import (
    STRATEGIES,
    select_strategy,
    stabilize_depth_sequence,
    upscale_depth,
)
from vda_tpu.utils.profiling import StageTimer


def test_strategy_selection_tiers():
    cpu = {"accelerator": "cpu", "accelerator_count": 0,
           "accelerator_memory_gb": 0}
    assert select_strategy(cpu).name == "cpu_fallback"
    small_tpu = {"accelerator": "tpu", "accelerator_count": 1,
                 "accelerator_memory_gb": 8.0}
    assert select_strategy(small_tpu).name == "tpu_conservative"
    big_tpu = {"accelerator": "tpu", "accelerator_count": 1,
               "accelerator_memory_gb": 16.0}
    assert select_strategy(big_tpu).name == "tpu_direct"
    # 4K source forces conservative even with memory
    assert select_strategy(big_tpu,
                           source_pixels=4096 * 2160).name == "tpu_conservative"


def test_strategies_are_consistent():
    for s in STRATEGIES.values():
        assert s.input_size % 14 != 1  # sanity: sizes map to patch grid
        assert s.micro_batch_size >= 1


def test_stabilization_reduces_temporal_noise():
    rng = np.random.default_rng(0)
    base = rng.random((32, 48)).astype(np.float32) * 5
    noisy = np.stack([base + rng.normal(0, 0.3, base.shape).astype(np.float32)
                      for _ in range(9)])
    stab = stabilize_depth_sequence(noisy, temporal_window=3)
    tv_before = np.abs(np.diff(noisy, axis=0)).mean()
    tv_after = np.abs(np.diff(stab, axis=0)).mean()
    assert tv_after < tv_before * 0.8
    assert stab.shape == noisy.shape


def test_upscale_depth():
    d = np.random.default_rng(1).random((3, 24, 30)).astype(np.float32)
    up = upscale_depth(d, (48, 60))
    assert up.shape == (3, 48, 60)
    same = upscale_depth(d, (24, 30))
    assert same.shape == d.shape


def test_stage_timer():
    t = StageTimer(sync=False)
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["b"]["count"] == 1
    assert rep["a"]["mean_ms"] >= 0
