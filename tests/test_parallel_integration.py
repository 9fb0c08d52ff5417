"""Integration coverage for the parallel layer: the trainer loop on a mesh,
hybrid dp x tp inference fan-out, and profiling utilities."""

import numpy as np
import pytest

import jax

from vda_tpu.models import init_video_depth_anything
from vda_tpu.parallel.mesh import make_mesh, param_shardings


@pytest.fixture(scope="module")
def cpu_devices():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    return devs


def test_trainer_loop_on_mesh(tiny_cfg, cpu_devices, tmp_path, monkeypatch):
    """parallel.trainer.train runs sharded steps and checkpoints."""
    import vda_tpu.parallel.trainer as trainer_mod
    from vda_tpu.parallel import trainer

    # pin the trainer's mesh to the CPU devices
    monkeypatch.setattr(
        trainer_mod, "make_mesh",
        lambda tp=1: make_mesh(n_devices=4, tp=tp, devices=cpu_devices))

    params = init_video_depth_anything(jax.random.PRNGKey(0), tiny_cfg)
    b = params["head"]["output_conv2"]["conv1"]["b"]
    params["head"]["output_conv2"]["conv1"]["b"] = b + 0.5

    rng = np.random.default_rng(0)
    s = tiny_cfg.vit.img_size

    def data():
        while True:
            yield {
                "video": rng.random((4, 2, s, s, 3)).astype(np.float32),
                "depth": (rng.random((4, 2, s, s)) * 3 + 0.2).astype(
                    np.float32),
                "mask": np.ones((4, 2, s, s), bool),
            }

    logs = []
    state = trainer.train(tiny_cfg, params, data(), num_steps=2,
                          ckpt_dir=str(tmp_path / "ck"), ckpt_every=100,
                          tp=2, log_fn=lambda step, m: logs.append(
                              float(m["total_loss"])))
    assert int(state.step) == 2
    assert len(logs) == 2 and all(np.isfinite(logs))
    # final checkpoint written
    assert any(d.startswith("step_") for d in
               __import__("os").listdir(tmp_path / "ck"))


def test_hybrid_dp_tp_inference(tiny_cfg, cpu_devices):
    """Window fan-out over 'data' with params sharded over 'model' must give
    the same depths as single-device inference."""
    from vda_tpu.infer import infer_video_depth

    params = init_video_depth_anything(jax.random.PRNGKey(2), tiny_cfg)
    rng = np.random.default_rng(0)
    frames = (rng.random((50, 70, 90, 3)) * 255).astype(np.uint8)

    d_ref, _ = infer_video_depth(params, frames, 24, tiny_cfg, input_size=56,
                                 fp32=True, window_batch=1)

    mesh = make_mesh(n_devices=4, tp=2, devices=cpu_devices)
    sharded_params = jax.device_put(params, param_shardings(params, mesh))
    with jax.set_mesh(mesh):
        d_tp, _ = infer_video_depth(sharded_params, frames, 24, tiny_cfg,
                                    input_size=56, fp32=True,
                                    window_batch=2, mesh=mesh)
    np.testing.assert_allclose(d_tp, d_ref, rtol=1e-4, atol=1e-5)


def test_profiling_stage_timer_sync(tiny_cfg):
    import jax.numpy as jnp

    from vda_tpu.utils.profiling import StageTimer, device_sync, trace

    t = StageTimer(sync=True)
    x = jnp.ones((64, 64))
    with t.stage("matmul", result_tree=x):
        y = x @ x
    device_sync(y)
    rep = t.report()
    assert rep["matmul"]["count"] == 1

    # trace() is a no-op without a log dir and must not raise with one
    with trace(None):
        pass


def test_tp_layout_roundtrip_and_equivalence(tiny_cfg):
    """to_tp_layout params + cfg.tp_layout must compute the same forward."""
    import jax.numpy as jnp

    from vda_tpu.models.vda import forward
    from vda_tpu.parallel.mesh import from_tp_layout, to_tp_layout

    params = init_video_depth_anything(jax.random.PRNGKey(0), tiny_cfg)
    s = tiny_cfg.vit.img_size
    x = jnp.asarray(np.random.default_rng(0).random((1, 2, s, s, 3)),
                    jnp.float32)
    base = np.asarray(forward(params, x, tiny_cfg, attn_impl="xla"))

    p_tp = to_tp_layout(params)
    qkv = p_tp["pretrained"]["blocks"][0]["attn"]["qkv"]
    assert qkv["w"].ndim == 3 and qkv["b"].ndim == 2
    cfg_tp = tiny_cfg.replace(tp_layout=True)
    got = np.asarray(forward(p_tp, x, cfg_tp, attn_impl="xla"))
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-6)

    p_back = from_tp_layout(p_tp)
    np.testing.assert_array_equal(
        np.asarray(p_back["pretrained"]["blocks"][0]["attn"]["qkv"]["w"]),
        np.asarray(params["pretrained"]["blocks"][0]["attn"]["qkv"]["w"]))


def test_tp_collective_structure(tiny_cfg, cpu_devices):
    """The head-aligned TP forward must compile to the Megatron
    2-collective pattern (VERDICT r2 #5): NO all-gathers or
    reduce-scatters around attention, and exactly one all-reduce per
    row-parallel projection — 2 per encoder block (attn proj, fc2/w3)
    plus 1 per temporal attention block (to_out)."""
    import re

    import jax.numpy as jnp

    from vda_tpu.models.vda import forward
    from vda_tpu.parallel.mesh import make_mesh, param_shardings, to_tp_layout

    cfg = tiny_cfg.replace(tp_layout=True)
    params = to_tp_layout(
        init_video_depth_anything(jax.random.PRNGKey(0), cfg))
    mesh = make_mesh(n_devices=2, tp=2, devices=cpu_devices)
    shardings = param_shardings(params, mesh)
    # the 3D qkv weight must actually be model-sharded (not the replicated
    # fallback the raw fused layout gets)
    qkv_spec = shardings["pretrained"]["blocks"][0]["attn"]["qkv"]["w"].spec
    assert qkv_spec == jax.sharding.PartitionSpec(None, None, "model")
    params = jax.device_put(params, shardings)
    s = cfg.vit.img_size
    x = jnp.zeros((1, 2, s, s, 3), jnp.float32)
    with jax.set_mesh(mesh):
        fn = jax.jit(lambda p, xx: forward(p, xx, cfg, attn_impl="xla",
                                           micro_batch_size=2))
        hlo = fn.lower(params, x).compile().as_text()

    # XLA's all-reduce combiner may merge INDEPENDENT psums into one op
    # with multiple operands, so count reduced operands, not call sites
    n_ar = sum(len(m.split(","))
               for m in re.findall(r"all-reduce(?:-start)?\(([^)]*)\)", hlo))
    n_ag = len(re.findall(r"all-gather(?:-start)?\(", hlo))
    n_rs = len(re.findall(r"reduce-scatter(?:-start)?\(", hlo))

    depth = cfg.vit.depth
    n_mm = 4
    expected_ar = depth * 2 + n_mm * cfg.num_transformer_block \
        * cfg.num_attention_blocks
    assert n_ag == 0, f"head-misalignment signature: {n_ag} all-gathers"
    assert n_rs == 0, f"unexpected reduce-scatters: {n_rs}"
    assert n_ar == expected_ar, (
        f"expected {expected_ar} reduced operands (2/encoder block + "
        f"1/temporal attention), got {n_ar}")


def test_sequence_parallel_equivalence_and_collectives(cpu_devices):
    """Megatron sequence parallelism (EncoderConfig.seq_shard): the forward
    must be numerically unchanged, and the norm regions must actually run
    token-sharded.  The CPU-visible HLO signature is the all-gathers
    re-entering attention/MLP (plain TP compiles to ZERO all-gathers —
    test_tp_collective_structure); the matching reduce-scatter on the
    row-parallel exits is a TPU/GPU partitioner rewrite of the
    all-reduce + dynamic-slice pair that XLA:CPU leaves as-is, so it is
    checked on hardware, not here."""
    import dataclasses
    import re

    import jax.numpy as jnp

    from vda_tpu.config import EncoderConfig, ModelConfig
    from vda_tpu.models.vda import forward
    from vda_tpu.parallel.mesh import make_mesh, param_shardings, to_tp_layout

    # img 70 -> 5x5 patches + cls = 26 tokens: evenly shardable over tp=2
    # (the 518-native window shape has 1370 tokens, also even)
    vit = EncoderConfig(embed_dim=64, depth=2, num_heads=2, img_size=70)
    cfg = ModelConfig("tiny", 32, (32, 32, 32, 32), (0, 0, 1, 1), vit,
                      num_frames=2)
    cfg_sp = cfg.replace(tp_layout=True,
                         vit=dataclasses.replace(vit, seq_shard=True))
    params = init_video_depth_anything(jax.random.PRNGKey(0), cfg)
    s = vit.img_size
    x = jnp.asarray(np.random.default_rng(5).random((2, 2, s, s, 3)),
                    jnp.float32)
    base = np.asarray(forward(params, x, cfg, attn_impl="xla",
                              micro_batch_size=4))

    p_tp = to_tp_layout(params)
    mesh = make_mesh(n_devices=4, tp=2, devices=cpu_devices)
    p_tp = jax.device_put(p_tp, param_shardings(p_tp, mesh))
    with jax.set_mesh(mesh):
        fn = jax.jit(lambda p, xx: forward(p, xx, cfg_sp, attn_impl="xla",
                                           micro_batch_size=4))
        hlo = fn.lower(p_tp, x).compile().as_text()
        got = np.asarray(fn(p_tp, x))
    np.testing.assert_allclose(got, base, rtol=1e-4, atol=1e-5)

    n_ag = len(re.findall(r"all-gather(?:-start)?\(", hlo))
    # one all-gather entering attention + one entering the MLP per block
    depth = vit.depth
    assert n_ag >= 2 * depth, (
        f"expected >= {2 * depth} all-gathers (token-sharded norm regions), "
        f"got {n_ag}")
