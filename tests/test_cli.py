"""CLI-level tests for apps/run.py and apps/run_streaming.py (tiny model)."""

import os

import numpy as np
import pytest

import jax

from vda_tpu.models import init_video_depth_anything


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    rng = np.random.default_rng(0)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (90, 70))
    base = (rng.random((70, 90, 3)) * 255).astype(np.uint8)
    for i in range(40):
        w.write(np.roll(base, i * 2, axis=1)[:, :, ::-1].copy())
    w.release()
    return path


@pytest.fixture()
def tiny_loader(tiny_cfg, monkeypatch):
    params = init_video_depth_anything(jax.random.PRNGKey(3), tiny_cfg)

    def fake_load(args):
        cfg = tiny_cfg.replace(metric=getattr(args, "metric", False))
        return cfg, params

    import apps.run as run_mod
    monkeypatch.setattr(run_mod, "load_model", fake_load)
    return params


def test_run_cli_full_outputs(tiny_loader, test_video, tmp_path):
    from apps.run import main

    out = str(tmp_path / "out")
    depths = main([
        "--input_video", test_video, "--output_dir", out,
        "--encoder", "vits", "--input_size", "56", "--fp32",
        "--save_npz", "--save_exr", "--grayscale",
    ])
    files = set(os.listdir(out))
    assert "clip_src.mp4" in files
    assert "clip_vis.mp4" in files
    assert "clip_depths.npz" in files
    npz = np.load(os.path.join(out, "clip_depths.npz"))
    assert npz["depths"].shape == (40, 70, 90)
    exr_dir = os.path.join(out, "clip_depths_exr")
    assert len(os.listdir(exr_dir)) == 40
    assert depths.shape == (40, 70, 90)


def test_run_cli_tensor_parallel(tiny_loader, test_video, tmp_path):
    """--tp 2 builds a ('data','model') mesh over the virtual devices and
    must reproduce the single-device depths (infer/windowed.py tp path)."""
    from apps.run import main

    if len(jax.devices("cpu")) < 4:
        pytest.skip("needs multiple virtual devices")
    d1 = main([
        "--input_video", test_video, "--output_dir", str(tmp_path / "a"),
        "--encoder", "vits", "--input_size", "56", "--fp32",
    ])
    dtp = main([
        "--input_video", test_video, "--output_dir", str(tmp_path / "b"),
        "--encoder", "vits", "--input_size", "56", "--fp32", "--tp", "2",
    ])
    np.testing.assert_allclose(dtp, d1, rtol=1e-4, atol=1e-5)


def test_run_cli_metric_point_clouds(tiny_loader, test_video, tmp_path):
    from apps.run import main

    out = str(tmp_path / "out_metric")
    main([
        "--input_video", test_video, "--output_dir", out,
        "--encoder", "vits", "--input_size", "56", "--metric",
        "--max_len", "8",
    ])
    plys = [f for f in os.listdir(out) if f.endswith(".ply")]
    assert len(plys) == 8


def test_run_streaming_cli(tiny_cfg, test_video, tmp_path, monkeypatch):
    params = init_video_depth_anything(jax.random.PRNGKey(3), tiny_cfg)

    def fake_load(args):
        return tiny_cfg, params

    import apps.run as run_mod
    monkeypatch.setattr(run_mod, "load_model", fake_load)
    from apps.run_streaming import main

    out = str(tmp_path / "out_stream")
    depths = main([
        "--input_video", test_video, "--output_dir", out,
        "--encoder", "vits", "--input_size", "56", "--max_len", "6",
        "--fp32",
    ])
    assert len(depths) == 6
    assert os.path.exists(os.path.join(out, "clip_vis.mp4"))


def test_run_streaming_cli_tensor_parallel(tiny_cfg, test_video, tmp_path,
                                           monkeypatch):
    """--tp 2 streams through a 2-chip model-parallel mesh and must match
    the single-device stream."""
    if len(jax.devices("cpu")) < 2:
        pytest.skip("needs multiple virtual devices")
    params = init_video_depth_anything(jax.random.PRNGKey(3), tiny_cfg)

    def fake_load(args):
        return tiny_cfg, params

    import apps.run as run_mod
    monkeypatch.setattr(run_mod, "load_model", fake_load)
    from apps.run_streaming import main

    common = ["--input_video", test_video, "--encoder", "vits",
              "--input_size", "56", "--max_len", "6", "--fp32"]
    d1 = main(common + ["--output_dir", str(tmp_path / "a")])
    dtp = main(common + ["--output_dir", str(tmp_path / "b"), "--tp", "2"])
    np.testing.assert_allclose(np.asarray(dtp), np.asarray(d1),
                               rtol=1e-4, atol=1e-5)
