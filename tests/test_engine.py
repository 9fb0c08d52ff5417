"""VFX engine tests: job processing, sequence templating, normalization,
metadata, queue protocol — with a tiny injected model (CPU)."""

import json
import os

import numpy as np
import pytest

import jax

from apps.engine import engine as eng
from apps.engine.sequence import (
    detect_frame_pattern,
    format_frame_path,
    is_image_sequence,
    read_image_sequence,
)
from vda_tpu.models import init_video_depth_anything


@pytest.fixture()
def tiny_engine(tiny_cfg, monkeypatch):
    params = init_video_depth_anything(jax.random.PRNGKey(2), tiny_cfg)
    e = eng.VideoDepthEngine()

    def fake_load(self, encoder, metric, checkpoint, random_init=False, fp32=False):
        self._cfg = tiny_cfg
        self._params = params
        self._model_key = (encoder, metric, checkpoint, random_init)

    monkeypatch.setattr(eng.VideoDepthEngine, "_load_model", fake_load)
    return e


def _write_sequence(tmp_path, n=6, h=70, w=90, fmt="plate.{:04d}.jpg"):
    import cv2

    rng = np.random.default_rng(0)
    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    for i in range(1, n + 1):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(seq_dir / fmt.format(i)), img)
    return str(seq_dir / "plate.%04d.jpg")


class TestSequence:
    def test_pattern_detection(self):
        assert detect_frame_pattern("a/b_%04d.exr") == "%04d"
        assert detect_frame_pattern("a/b.####.jpg") == "####"
        assert detect_frame_pattern("a/b_%d.png") == "%d"
        assert detect_frame_pattern("a/b.mp4") is None
        assert is_image_sequence("x.%05d.exr")
        assert not is_image_sequence("x.mov")

    def test_format(self):
        assert format_frame_path("p_%04d.jpg", 7) == "p_0007.jpg"
        assert format_frame_path("p.###.jpg", 42) == "p.042.jpg"
        assert format_frame_path("p_%d.jpg", 42) == "p_42.jpg"

    def test_read_sequence(self, tmp_path):
        template = _write_sequence(tmp_path, n=4)
        frames, numbers = read_image_sequence(template, 1, 4)
        assert frames.shape == (4, 70, 90, 3)
        assert numbers == [1, 2, 3, 4]
        # missing frames skipped
        frames2, numbers2 = read_image_sequence(template, 1, 10)
        assert numbers2 == [1, 2, 3, 4]


class TestNormalization:
    def test_near_far_mapping(self):
        depth = np.linspace(2.0, 7.0, 10).reshape(2, 5)
        out = eng.normalize_depth(depth, 0.0, 1.0, invert_depth=False)
        assert out.min() == pytest.approx(0.0)
        assert out.max() == pytest.approx(1.0)

    def test_inversion(self):
        depth = np.linspace(2.0, 7.0, 10).reshape(2, 5)
        out = eng.normalize_depth(depth, 0.0, 1.0, invert_depth=True)
        assert out.flat[0] == pytest.approx(1.0)
        assert out.flat[-1] == pytest.approx(0.0)

    def test_constant_depth(self):
        depth = np.full((4, 4), 3.0)
        out = eng.normalize_depth(depth, 0.2, 0.9, invert_depth=False)
        np.testing.assert_allclose(out, 0.2)


class TestEncoderDetect:
    def test_from_job(self):
        assert eng.detect_encoder({"encoder": "vitb"}, "x_vitl.pth") == "vitb"

    def test_from_checkpoint(self):
        assert eng.detect_encoder({}, "c/video_depth_anything_vitl.pth") == "vitl"

    def test_fallback(self):
        assert eng.detect_encoder({}, "weird.pth") == "vits"


class TestUhdCap:
    def test_no_resize_needed(self):
        frames = np.zeros((2, 100, 200, 3), np.uint8)
        out, resized, orig, new = eng.resize_frames_to_uhd_max(frames)
        assert not resized and out.shape == frames.shape

    def test_resize_over_uhd(self):
        frames = np.zeros((1, 2400, 5000, 3), np.uint8)
        out, resized, orig, new = eng.resize_frames_to_uhd_max(frames)
        assert resized
        assert new[0] <= 4096 and new[1] <= 2160
        assert new[0] % 2 == 0 and new[1] % 2 == 0


class TestProcessJob:
    def test_image_sequence_job(self, tiny_engine, tmp_path):
        template = _write_sequence(tmp_path, n=5)
        out_dir = tmp_path / "exr_out"
        job = {
            "input_video": template,
            "exr_output_dir": str(out_dir),
            "first_frame": 1,
            "last_frame": 5,
            "metric_depth": False,
            "floating_point": "full",
            "encoder": "tiny",
            "video_depth_anything_checkpoint": "none.pth",
            "input_size": 56,
            "exr_first_frame": 1001,
            "enable_normalization": True,
            "normalization_near": 0.0,
            "normalization_far": 1.0,
            "invert_depth": True,
            "create_depth_vis_mp4": True,
        }
        result = tiny_engine.process_job(job)
        assert result["status"] == "success", result
        files = sorted(os.listdir(out_dir))
        # 5 depth frames (exr or png fallback) + metadata + vis mp4
        depth_files = [f for f in files if "depth.10" in f]
        assert len(depth_files) == 5
        assert depth_files[0].endswith(("1001.exr", "1001.png"))
        assert "metadata.json" in files
        assert any(f.endswith("_vis.mp4") for f in files)
        meta = json.load(open(out_dir / "metadata.json"))
        assert meta["encoder"] == "tiny"
        assert meta["invert_depth"] is True

    def test_oom_degradation_ladder(self, tiny_engine, tmp_path):
        """Mid-job accelerator OOM walks the ladder: requested ->
        conservative_384 -> chunked_224 and completes degraded
        (reference engine_backup.py:1010-1352 fallback chain)."""
        from vda_tpu.infer import infer_video_depth

        calls = []

        def oom_infer(params, frames, fps, cfg, input_size=518, fp32=False,
                      micro_batch_size=4, attn_impl="auto"):
            calls.append((input_size, len(frames)))
            if input_size > 224:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Ran out of memory in memory space "
                    "hbm while allocating")
            return infer_video_depth(params, frames, fps, cfg,
                                     input_size=56, fp32=fp32,
                                     micro_batch_size=micro_batch_size)

        tiny_engine._infer_fn = oom_infer
        template = _write_sequence(tmp_path, n=4)
        out_dir = tmp_path / "exr_out"
        job = {
            "input_video": template,
            "exr_output_dir": str(out_dir),
            "first_frame": 1,
            "last_frame": 4,
            "encoder": "tiny",
            "video_depth_anything_checkpoint": "none.pth",
            "input_size": 518,
        }
        result = tiny_engine.process_job(job)
        assert result["status"] == "success", result
        assert result["degraded"] == ["requested", "conservative_384"]
        # requested 518 OOM'd, 384 OOM'd, chunked 224 succeeded
        assert [c[0] for c in calls] == [518, 384, 224]
        meta = json.load(open(out_dir / "metadata.json"))
        assert meta["processing_degradation"] == [
            "requested", "conservative_384"]

    def test_chunked_tier_aligns_across_chunks(self, tiny_engine, tmp_path):
        """Chunked degradation runs infer per 32-frame chunk; each chunk's
        depth is affine-ambiguous, so the ladder must scale/shift-align
        chunks on their overlap frames (no depth-scale jumps at chunk
        boundaries)."""
        calls = []

        def fake_infer(params, frames, fps, cfg, input_size=518, fp32=False,
                       micro_batch_size=4, attn_impl="auto"):
            calls.append(len(frames))
            if input_size > 224:
                raise RuntimeError("RESOURCE_EXHAUSTED: hbm")
            # depth = affine-distorted view of the frame content, a different
            # affine per call (the ambiguity the ladder must undo)
            i = len(calls)
            base = frames[..., 0].astype(np.float32)
            return base * (2.0 ** i) + 3.0 * i, fps

        tiny_engine._infer_fn = fake_infer
        n = 36  # > INFER_LEN so the chunked tier needs 2 aligned chunks
        rng = np.random.default_rng(1)
        frames = (rng.random((n, 24, 32, 3)) * 255).astype(np.uint8)
        depths, _fps, degraded = tiny_engine._infer_with_degradation(
            frames, 24.0, input_size=518, fp32=False, micro_batch=4)
        assert degraded == ["requested", "conservative_384"]
        assert len(calls) >= 4 and all(c <= 32 for c in calls[2:])
        assert depths.shape[0] == n
        # every chunk must land in the FIRST chunk's affine frame: with the
        # first chunked call being call #3, depth == base * 8 + 9 throughout
        # (the second chunk arrived as base*16+12 and must be re-aligned)
        expected = frames[..., 0].astype(np.float32) * 8.0 + 9.0
        np.testing.assert_allclose(depths, expected, rtol=1e-4, atol=1e-2)

    def test_cpu_tier_disables_pallas_and_uses_xla(self, tiny_engine,
                                                   tmp_path):
        """The last-resort CPU tier must force the XLA kernel paths: Pallas
        dispatch predicates test TPU presence, not placement, and Mosaic
        kernels don't lower for the CPU backend."""
        seen = []

        def fake_infer(params, frames, fps, cfg, input_size=518, fp32=False,
                       micro_batch_size=4, attn_impl="auto"):
            seen.append((input_size,
                         os.environ.get("VDA_DISABLE_PALLAS"), attn_impl))
            if len(seen) < 4:  # OOM through every non-CPU tier
                raise RuntimeError("RESOURCE_EXHAUSTED: hbm")
            h, w = frames.shape[1:3]
            return np.ones((len(frames), h, w), np.float32), fps

        tiny_engine._infer_fn = fake_infer
        template = _write_sequence(tmp_path, n=3)
        result = tiny_engine.process_job({
            "input_video": template,
            "exr_output_dir": str(tmp_path / "o2"),
            "first_frame": 1,
            "last_frame": 3,
            "encoder": "tiny",
            "video_depth_anything_checkpoint": "none.pth",
            "input_size": 518,
        })
        assert result["status"] == "success", result
        assert result["degraded"] == ["requested", "conservative_384",
                                      "chunked_224"]
        # the first three tiers run with pallas enabled, the CPU tier with
        # the kill-switch set and the xla attention impl
        assert seen[:3] == [(518, None, "auto"), (384, None, "auto"),
                            (224, None, "auto")]
        assert seen[3] == (224, "1", "xla")
        # and the kill-switch is restored afterwards
        assert os.environ.get("VDA_DISABLE_PALLAS") is None

    def test_non_oom_errors_not_retried(self, tiny_engine, tmp_path):
        """A non-OOM failure must surface immediately, not walk the ladder."""
        calls = []

        def broken_infer(params, frames, fps, cfg, **kw):
            calls.append(kw.get("input_size"))
            raise ValueError("bad frames")

        tiny_engine._infer_fn = broken_infer
        template = _write_sequence(tmp_path, n=2)
        result = tiny_engine.process_job({
            "input_video": template,
            "exr_output_dir": str(tmp_path / "o"),
            "first_frame": 1,
            "last_frame": 2,
            "encoder": "tiny",
            "video_depth_anything_checkpoint": "none.pth",
        })
        assert result["status"] == "error"
        assert "bad frames" in result["message"]
        assert len(calls) == 1

    def test_error_reported_not_raised(self, tiny_engine, tmp_path):
        result = tiny_engine.process_job({
            "input_video": "/nonexistent/foo.%04d.jpg",
            "exr_output_dir": str(tmp_path / "o"),
            "first_frame": 1,
            "last_frame": 2,
        })
        assert result["status"] == "error"
        assert "message" in result


def test_queue_protocol(tiny_engine, tmp_path, monkeypatch):
    """One queue iteration: job file consumed, status transitions written."""
    template = _write_sequence(tmp_path, n=3)
    comm = tmp_path / "communication"
    comm.mkdir()
    job_file = comm / "job_queue.json"
    job = {
        "input_video": template,
        "exr_output_dir": str(tmp_path / "out"),
        "first_frame": 1,
        "last_frame": 3,
        "input_size": 56,
    }
    job_file.write_text(json.dumps(job))

    # run a single poll iteration manually (same logic as run_queue's loop)
    status_file = comm / "status.json"
    with open(job_file) as f:
        job_data = json.load(f)
    status_file.write_text(json.dumps({"status": "processing"}))
    result = tiny_engine.process_job(job_data)
    status_file.write_text(json.dumps(result))
    os.remove(job_file)

    assert not job_file.exists()
    final = json.loads(status_file.read_text())
    assert final["status"] == "success"
    assert (tmp_path / "out" / "metadata.json").exists()
