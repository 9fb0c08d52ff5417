"""Host I/O: video round-trip, depth writers, stitching edge cases."""

import os

import numpy as np

from vda_tpu.infer.stitching import (
    compute_scale_and_shift,
    get_interpolate_frames,
    stitch_windows,
)
from vda_tpu.config import INFER_LEN
from vda_tpu.utils.io import (
    read_video_frames,
    save_depth_exr_sequence,
    save_point_clouds,
    save_video,
)


def test_video_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frames = (rng.random((12, 64, 80, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "v.mp4")
    save_video(frames, path, fps=10)
    back, fps = read_video_frames(path)
    assert back.shape == frames.shape
    assert abs(fps - 10) < 0.5
    # lossy codec: just check gross correlation
    assert np.corrcoef(frames.ravel(), back.ravel())[0, 1] > 0.5


def test_video_fps_stride(tmp_path):
    frames = np.zeros((30, 64, 80, 3), np.uint8)
    path = str(tmp_path / "v.mp4")
    save_video(frames, path, fps=30)
    back, fps = read_video_frames(path, target_fps=10)
    assert fps == 10
    assert back.shape[0] == 10


def test_depth_vis_video(tmp_path):
    depths = np.linspace(0, 5, 8 * 64 * 80).reshape(8, 64, 80).astype(np.float32)
    path = str(tmp_path / "vis.mp4")
    save_video(depths, path, fps=8, is_depths=True)
    assert os.path.getsize(path) > 0
    save_video(depths, str(tmp_path / "gray.mp4"), fps=8, is_depths=True,
               grayscale=True)


def test_exr_sequence_fallback(tmp_path):
    depths = np.random.default_rng(1).random((3, 32, 40)).astype(np.float32)
    out = str(tmp_path / "exr")
    save_depth_exr_sequence(out, depths)
    files = os.listdir(out)
    assert len(files) == 3  # exr, or png/npy fallback per frame


def test_point_cloud_writer(tmp_path):
    rng = np.random.default_rng(2)
    frames = (rng.random((2, 16, 20, 3)) * 255).astype(np.uint8)
    depths = rng.random((2, 16, 20)).astype(np.float32) + 0.5
    save_point_clouds(str(tmp_path), frames, depths, 470.4, 470.4)
    ply = tmp_path / "point0000.ply"
    assert ply.exists()
    head = ply.read_bytes()[:200].decode("ascii", "ignore")
    assert "element vertex 320" in head


class TestStitching:
    def test_scale_shift_exact(self):
        rng = np.random.default_rng(3)
        target = rng.random(1000)
        pred = (target - 0.25) / 2.0
        s, t = compute_scale_and_shift(pred, target, np.ones_like(target))
        assert abs(s - 2.0) < 1e-4 and abs(t - 0.25) < 1e-4

    def test_cross_fade_endpoints(self):
        pre = [np.full((4, 4), 1.0) for _ in range(8)]
        post = [np.full((4, 4), 3.0) for _ in range(8)]
        out = get_interpolate_frames(pre, post)
        np.testing.assert_allclose(out[0], 1.0)   # weight 0 at the start
        np.testing.assert_allclose(out[-1], 3.0)  # weight 1 at the end

    def test_metric_mode_skips_alignment(self):
        rng = np.random.default_rng(4)
        # two windows whose overlap disagrees by a scale factor
        w1 = [rng.random((8, 8)) + 1 for _ in range(INFER_LEN)]
        w2 = [d * 2.0 for d in w1]
        aligned_rel = stitch_windows(w1 + w2, metric=False)
        aligned_met = stitch_windows(w1 + w2, metric=True)
        # metric mode keeps the raw values of the non-overlap frames
        np.testing.assert_allclose(aligned_met[-1], w2[-1])
        # relative mode rescales window 2 toward window 1's reference
        assert not np.allclose(aligned_rel[-1], w2[-1])
