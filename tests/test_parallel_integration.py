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
