"""On-device clip augmentation (utils/augment) + training recipe wiring."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vda_tpu.utils.augment import augment_batch, random_resized_crop

B, T, H, W = 2, 3, 24, 30
OUT = (16, 20)


def _ramp_batch():
    """video channel 0 == depth == a spatial ramp: any spatially consistent
    transform must keep them equal."""
    y = np.linspace(0.0, 1.0, H)[:, None]
    x = np.linspace(0.0, 1.0, W)[None, :]
    ramp = (0.6 * y + 0.4 * x).astype(np.float32)
    video = np.broadcast_to(ramp[None, None, :, :, None],
                            (B, T, H, W, 3)).copy()
    depth = np.broadcast_to(ramp[None, None], (B, T, H, W)).copy()
    return {
        "video": jnp.asarray(video),
        "depth": jnp.asarray(depth),
        "mask": jnp.ones((B, T, H, W), bool),
    }


def test_crop_flip_consistent_across_modalities():
    out = augment_batch(jax.random.PRNGKey(0), _ramp_batch(), OUT,
                        jitter=(0.0, 0.0, 0.0))
    assert out["video"].shape == (B, T, *OUT, 3)
    assert out["depth"].shape == (B, T, *OUT)
    assert out["mask"].shape == (B, T, *OUT)
    # the same box/flip hit video (bilinear) and depth (nearest tap): on the
    # smooth ramp they agree to within one source grid cell
    cell = 0.6 / (H - 1) + 0.4 / (W - 1)
    assert float(np.abs(np.asarray(out["video"][..., 0])
                        - np.asarray(out["depth"])).max()) <= cell + 1e-6
    # nearest resampling NEVER invents depth values: every output value
    # exists somewhere in the source depth
    src = np.unique(np.asarray(_ramp_batch()["depth"]))
    got = np.asarray(out["depth"]).ravel()
    assert np.isin(np.round(got, 6), np.round(src, 6)).all()
    # a fully valid input stays fully valid (box is inside the image)
    assert bool(np.asarray(out["mask"]).all())


def test_mask_holes_never_shrink():
    batch = _ramp_batch()
    mask = np.ones((B, T, H, W), bool)
    mask[:, :, 10:14, 12:18] = False
    batch["mask"] = jnp.asarray(mask)
    out = augment_batch(jax.random.PRNGKey(1), batch, OUT,
                        jitter=(0.0, 0.0, 0.0))
    m = np.asarray(out["mask"])
    assert not m.all()          # the hole survives resampling
    assert m.any()              # but does not swallow the frame


def test_deterministic_per_key():
    batch = _ramp_batch()
    a = augment_batch(jax.random.PRNGKey(2), batch, OUT)
    b = augment_batch(jax.random.PRNGKey(2), batch, OUT)
    c = augment_batch(jax.random.PRNGKey(3), batch, OUT)
    np.testing.assert_array_equal(np.asarray(a["video"]),
                                  np.asarray(b["video"]))
    assert np.abs(np.asarray(a["video"]) - np.asarray(c["video"])).max() > 1e-4


def test_identity_box_is_identity_or_mirror():
    batch = _ramp_batch()
    out = random_resized_crop(jax.random.PRNGKey(4), batch["video"][0],
                              batch["depth"][0], batch["mask"][0],
                              (H, W), scale_range=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out[1]),
                               np.asarray(batch["depth"][0]), rtol=1e-5,
                               atol=1e-6)


def test_jit_static_shapes():
    import functools

    fn = jax.jit(functools.partial(augment_batch, out_hw=OUT))
    out = fn(jax.random.PRNGKey(5), _ramp_batch())
    assert out["video"].shape == (B, T, *OUT, 3)
    assert jnp.isfinite(out["video"]).all()


def test_trainer_augment_and_schedule(tiny_cfg):
    """One sharded step with augmentation + warmup-cosine + clipping wired
    through parallel/trainer.train."""
    from vda_tpu.models import init_video_depth_anything
    from vda_tpu.parallel.trainer import train

    params = init_video_depth_anything(jax.random.PRNGKey(0), tiny_cfg)
    rng = np.random.default_rng(0)
    s_in, s_out = 70, tiny_cfg.vit.img_size

    def data():
        while True:
            yield {
                "video": rng.random((8, 2, s_in, s_in, 3),
                                    dtype=np.float32),
                "depth": rng.random((8, 2, s_in, s_in),
                                    dtype=np.float32) + 0.1,
                "mask": np.ones((8, 2, s_in, s_in), bool),
            }

    logged = []
    state = train(tiny_cfg, params, data(), num_steps=2,
                  schedule=True, warmup_steps=1, clip_norm=1.0,
                  augment_hw=(s_out, s_out),
                  log_fn=lambda step, m: logged.append(
                      float(m["total_loss"])))
    assert int(state.step) == 2
    assert np.isfinite(logged).all()


def test_manifest_clip_iter(tmp_path):
    """apps/train.manifest_clip_iter reads the benchmark-extract manifest
    layout and yields normalized clips with disparity targets."""
    import json
    import sys

    import cv2

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from apps.train import manifest_clip_iter

    rng = np.random.default_rng(0)
    entries = []
    seq = tmp_path / "seq0"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    for i in range(6):
        img = rng.integers(0, 255, (20, 26, 3), np.uint8)
        dep = rng.integers(100, 5000, (20, 26), np.uint16)
        cv2.imwrite(str(seq / "rgb" / f"{i:04d}.png"), img)
        cv2.imwrite(str(seq / "depth" / f"{i:04d}.png"), dep)
        entries.append({"image": f"seq0/rgb/{i:04d}.png",
                        "gt_depth": f"seq0/depth/{i:04d}.png",
                        "factor": 1000.0})
    manifest = tmp_path / "m.json"
    manifest.write_text(json.dumps({"toy": [{"seq0": entries}]}))

    it = manifest_clip_iter(str(manifest), batch=2, frames=4, size=16)
    batch = next(it)
    assert batch["video"].shape == (2, 4, 16, 16, 3)
    assert batch["depth"].shape == (2, 4, 16, 16)
    assert 0.0 <= batch["video"].min() and batch["video"].max() <= 1.0
    assert batch["mask"].all()                     # all depths > 0
    # disparity: depth 0.1..5 m -> disparity 0.2..10
    assert batch["depth"].min() > 0.19 and batch["depth"].max() < 10.1

    with pytest.raises(ValueError):
        next(manifest_clip_iter(str(manifest), batch=1, frames=10, size=16))
