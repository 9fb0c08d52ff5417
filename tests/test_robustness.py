"""Robustness: aspect-ratio guard e2e, long-run eviction bookkeeping,
benchmark infer runner, engine queue as a real process."""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from vda_tpu.config import INFER_LEN, STREAM_GAP


def test_windowed_aspect_guard_matches_reference():
    """Wide video (ratio > 1.78) triggers the input-size guard and a
    non-square patch grid — full-pipeline parity vs the reference
    (video_depth.py:72-75 + dinov2.py:179-210 interpolation path)."""
    torch = pytest.importorskip("torch")
    import cv2

    from tests.test_infer_parity import (
        CFG4,
        _build_ref_modules,
        _ref_windowed_model,
    )
    from vda_tpu.utils.convert import convert_state_dict
    from vda_tpu.infer import infer_video_depth

    pretrained, head = _build_ref_modules()
    sd = {f"pretrained.{k}": v for k, v in pretrained.state_dict().items()}
    sd.update({f"head.{k}": v for k, v in head.state_dict().items()})
    params = convert_state_dict(sd, CFG4)
    ref_model = _ref_windowed_model(pretrained, head)

    rng = np.random.default_rng(5)
    small = rng.random((8, 5, 13, 3))
    frames = np.stack([
        (cv2.resize(s, (130, 66), interpolation=cv2.INTER_CUBIC).clip(0, 1)
         * 255).astype(np.uint8) for s in small
    ])  # ratio 130/66 = 1.97 > 1.78 -> guard engages

    ref_depths, _ = ref_model.infer_video_depth(
        frames, 24, input_size=84, device="cpu", fp32=True)
    our_depths, _ = infer_video_depth(params, frames, 24, CFG4,
                                      input_size=84, fp32=True)
    scale = max(float(np.abs(ref_depths).max()), 1e-6)
    err = np.abs(our_depths - ref_depths).max() / scale
    assert err < 5e-3, f"aspect-guard parity rel err {err}"


def test_streaming_bookkeeping_matches_reference_simulation():
    """The host-side order/free bookkeeping must track the reference's
    frame_cache_list evolution (video_depth_stream.py:104-160) for long runs."""
    # reference simulation in index space: entries identified by frame id
    ref_list = None
    gap = STREAM_GAP

    class Sim:
        def __init__(self):
            self.ids = []
            self.id = -1

        def step(self):
            self.id += 1
            if self.id == 0:
                self.ids = [0] * INFER_LEN
            else:
                ctx = self.ids[0:2] + self.ids[-(INFER_LEN - 3):]
                self.ids.append(self.id)
            if self.id + INFER_LEN > gap + 1:
                del self.ids[1]
            return self.ids[0:2] + self.ids[-(INFER_LEN - 3):] \
                if self.id > 0 else None

    # our bookkeeping (StreamingDepth logic without the device work)
    class Ours:
        def __init__(self):
            self.order = []
            self.free = []
            self.id = -1
            self.id_of_row = {}

        def step(self):
            self.id += 1
            ctx = None
            if self.id == 0:
                self.order = [0] * INFER_LEN
                self.free = list(range(1, STREAM_GAP + 2))
                self.id_of_row[0] = 0
            else:
                ctx = [self.id_of_row[r]
                       for r in self.order[0:2]
                       + self.order[-(INFER_LEN - 3):]]
                pos = self.free.pop(0)
                self.id_of_row[pos] = self.id
                self.order.append(pos)
            if self.id + INFER_LEN > STREAM_GAP + 1:
                evicted = self.order.pop(1)
                if evicted not in self.order:
                    self.free.append(evicted)
            return ctx

    sim, ours = Sim(), Ours()
    for i in range(200):
        want = None
        if i > 0:
            want = sim.ids[0:2] + sim.ids[-(INFER_LEN - 3):]
        sim_ctx_after = sim.step()
        got = ours.step()
        if i > 0:
            assert got == want, f"frame {i}: {got} != {want}"


def test_benchmark_infer_runner(tmp_path, tiny_cfg, monkeypatch):
    """benchmark/infer/infer.py writes per-frame .npy mirroring image paths."""
    import cv2
    import jax

    from benchmark.dataset_extract.extract_utils import gen_json
    from vda_tpu.models import init_video_depth_anything

    rng = np.random.default_rng(0)
    ds_root = tmp_path / "bench" / "scannet"
    for i in range(6):
        color = ds_root / "scene0000" / "color"
        depth = ds_root / "scene0000" / "depth"
        color.mkdir(parents=True, exist_ok=True)
        depth.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(color / f"{i:04d}.jpg"),
                    (rng.random((70, 90, 3)) * 255).astype(np.uint8))
        cv2.imwrite(str(depth / f"{i:04d}.png"),
                    (rng.random((70, 90)) * 5000).astype(np.uint16))
    json_file = ds_root / "scannet_video.json"
    gen_json(str(ds_root), "scannet", 0, 6, 1, str(json_file))

    params = init_video_depth_anything(jax.random.PRNGKey(0), tiny_cfg)
    import apps.run as run_mod
    monkeypatch.setattr(run_mod, "load_model",
                        lambda args: (tiny_cfg, params))

    from benchmark.infer.infer import main
    infer_dir = str(tmp_path / "preds")
    main(["--infer_path", infer_dir, "--json_file", str(json_file),
          "--datasets", "scannet", "--encoder", "vits", "--input_size", "56",
          "--random-init"])
    preds = sorted((tmp_path / "preds" / "scannet" / "scene0000"
                    / "color").glob("*.npy"))
    assert len(preds) == 6
    assert np.load(preds[0]).shape == (70, 90)


@pytest.mark.slow
def test_engine_queue_daemon_process(tmp_path):
    """Spawn the real queue daemon, submit a job file, watch status.json
    transition to success, and confirm the job file is consumed."""
    import cv2

    rng = np.random.default_rng(1)
    seq = tmp_path / "seq"
    seq.mkdir()
    for i in range(1, 4):
        cv2.imwrite(str(seq / f"p.{i:04d}.jpg"),
                    (rng.random((70, 90, 3)) * 255).astype(np.uint8))
    comm = tmp_path / "communication"
    out = tmp_path / "out"

    env = dict(os.environ)
    env["VDA_TEST_TINY"] = "1"
    proc = subprocess.Popen(
        [sys.executable, "-c", f"""
import jax
jax.config.update("jax_default_device", "cpu")
import sys
sys.path.insert(0, {str(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r})
import apps.engine.engine as eng
from vda_tpu.config import EncoderConfig, ModelConfig
from vda_tpu.models import init_video_depth_anything
vit = EncoderConfig(embed_dim=64, depth=2, num_heads=2, img_size=56)
cfg = ModelConfig("tiny", 32, (32, 32, 32, 32), (0, 0, 1, 1), vit)
params = init_video_depth_anything(jax.random.PRNGKey(0), cfg)
def fake_load(self, encoder, metric, checkpoint, random_init=False, fp32=False):
    self._cfg, self._params = cfg, params
    self._model_key = (encoder, metric)
eng.VideoDepthEngine._load_model = fake_load
eng.run_queue({str(comm)!r})
"""],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        # wait for the daemon to come up
        status_file = comm / "status.json"
        deadline = time.time() + 60
        while time.time() < deadline and not status_file.exists():
            time.sleep(0.2)
        assert status_file.exists(), "daemon never wrote status.json"

        job = {
            "input_video": str(seq / "p.%04d.jpg"),
            "exr_output_dir": str(out),
            "first_frame": 1,
            "last_frame": 3,
            "input_size": 56,
        }
        (comm / "job_queue.json").write_text(json.dumps(job))

        deadline = time.time() + 240
        final = None
        while time.time() < deadline:
            try:
                final = json.loads(status_file.read_text())
            except (json.JSONDecodeError, FileNotFoundError):
                final = None
            if final and final.get("status") in ("success", "error"):
                break
            time.sleep(0.5)
        assert final and final["status"] == "success", final
        assert not (comm / "job_queue.json").exists()
        assert (out / "metadata.json").exists()
    finally:
        proc.terminate()
        proc.wait(timeout=10)
