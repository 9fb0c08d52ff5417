"""Batch sequence processor e2e with an injected tiny model (CPU)."""

import numpy as np

import jax

from apps import colab_processor as cp
from vda_tpu.models import init_video_depth_anything


def _write_sequence(tmp_path, n=5, h=70, w=90):
    import cv2

    rng = np.random.default_rng(3)
    d = tmp_path / "plates"
    d.mkdir()
    for i in range(1001, 1001 + n):
        cv2.imwrite(str(d / f"shot.{i:04d}.jpg"),
                    (rng.random((h, w, 3)) * 255).astype(np.uint8))
    return str(d / "shot.%04d.jpg")


def test_process_batch_sequences(tmp_path, tiny_cfg, monkeypatch):
    params = init_video_depth_anything(jax.random.PRNGKey(1), tiny_cfg)

    def fake_init(self, encoder="vits", metric=False, checkpoint=None,
                  fp32=False, random_init=False, input_size=518):
        self.cfg = tiny_cfg
        self.params = params
        self.input_size = 56
        self.fp32 = True

    monkeypatch.setattr(cp.BatchSequenceProcessor, "__init__", fake_init)

    template = _write_sequence(tmp_path)
    out_dir = tmp_path / "depth_out"
    config = {
        "sh010": {
            "template": template,
            "first_frame": 1001,
            "last_frame": 1005,
            "output_dir": str(out_dir),
            "save_vis_mp4": True,
        }
    }
    results = cp.process_batch_sequences(config, random_init=True)
    assert len(results["sh010"]) == 5
    names = sorted(p.split("/")[-1] for p in results["sh010"])
    # VFX frame numbering preserved from the plate sequence (1001-based)
    assert names[0].startswith("depth.1001.")
    assert (out_dir / "depth_vis.mp4").exists()
