"""End-to-end dataset extractor tests on synthetic raw layouts.

Each of the five reference extractors (reference benchmark/dataset_extract/
dataset_extract_{kitti,sintel,bonn,nyuv2,scannet}.py; consolidated in
benchmark/dataset_extract/extract.py) runs against a fabricated raw dataset
tree and the canonical output + manifest contract is checked: directory
names, per-dataset crops, depth scale factors, and the ScanNet TAE
manifest's K/pose payload.
"""

import json
import os
import os.path as osp

import numpy as np
import pytest

from benchmark.dataset_extract import extract as E
from benchmark.dataset_extract import extract_utils as u

cv2 = pytest.importorskip("cv2")

RNG = np.random.default_rng(0)


def _img(h, w):
    return (RNG.random((h, w, 3)) * 255).astype(np.uint8)


def _write_png16(path, h, w):
    os.makedirs(osp.dirname(path), exist_ok=True)
    cv2.imwrite(path, (RNG.random((h, w)) * 5000).astype(np.uint16))


def _write_img(path, h, w, ext=".png"):
    os.makedirs(osp.dirname(path), exist_ok=True)
    cv2.imwrite(path, _img(h, w))


def _load_manifest(path):
    with open(path) as f:
        return json.load(f)


def test_kitti_extract(tmp_path):
    root, depth_root, out = (str(tmp_path / d) for d in
                             ("raw", "rawd", "out"))
    seq = "2011_09_26_drive_0002_sync"
    for i in range(4):
        name = f"{i:010d}.png"
        _write_img(osp.join(root, seq[:10], seq, "image_02/data", name),
                   375, 1241)  # odd dims -> even crop
        _write_png16(osp.join(depth_root, seq,
                              "proj_depth/groundtruth/image_02", name),
                     375, 1241)
    E.extract_kitti(root, depth_root, out)
    m = _load_manifest(osp.join(out, "kitti", "kitti_video.json"))
    entries = m["kitti"][0][seq]
    assert len(entries) == 4
    assert entries[0]["factor"] == 256.0
    rgb = cv2.imread(osp.join(out, "kitti", entries[0]["image"]))
    assert rgb.shape[:2] == (374, 1240)  # even-dims crop
    assert osp.exists(osp.join(out, "kitti", "kitti_video_500.json"))


def test_bonn_extract(tmp_path):
    root, depth_root, out = (str(tmp_path / d) for d in
                             ("raw", "rawd", "out"))
    seq = "rgbd_bonn_balloon"
    for i in range(3):
        name = f"frame_{i:04d}.png"
        _write_img(osp.join(root, seq, "rgb", name), 480, 640)
        _write_img(osp.join(depth_root, seq, "rgb", name), 480, 640)
        _write_png16(osp.join(depth_root, seq, "depth", name), 480, 640)
    E.extract_bonn(root, depth_root, out)
    m = _load_manifest(osp.join(out, "bonn", "bonn_video_500.json"))
    entries = m["bonn"][0][seq]
    assert len(entries) == 3 and entries[0]["factor"] == 5000.0
    # bonn_video.json windows 30:140 — empty with only 3 frames
    m2 = _load_manifest(osp.join(out, "bonn", "bonn_video.json"))
    assert m2["bonn"][0][seq] == []


def test_sintel_extract(tmp_path):
    root, depth_root, out = (str(tmp_path / d) for d in
                             ("raw", "rawd", "out"))
    seq = "alley_1"
    depth = (RNG.random((48, 64)).astype(np.float32) * 100)
    for i in range(3):
        name = f"frame_{i:04d}.png"
        _write_img(osp.join(root, seq, name), 48, 64)
        dpt_path = osp.join(depth_root, seq, name[:-3] + "dpt")
        os.makedirs(osp.dirname(dpt_path), exist_ok=True)
        with open(dpt_path, "wb") as f:
            np.float32(u.SINTEL_TAG_FLOAT).tofile(f)
            np.int32(64).tofile(f)
            np.int32(48).tofile(f)
            depth.tofile(f)
    E.extract_sintel(root, depth_root, out)
    m = _load_manifest(osp.join(out, "sintel", "sintel_video.json"))
    entries = m["sintel"][0][seq]
    assert len(entries) == 3
    assert entries[0]["factor"] == pytest.approx(65535 / 650)
    # scene-major canonical layout (the reference's own extractor writes
    # type-major, which its gen_json can't read — see extract_sintel note)
    assert entries[0]["image"].startswith(f"{seq}/clean/")
    dep = cv2.imread(osp.join(out, "sintel", entries[0]["gt_depth"]),
                     cv2.IMREAD_UNCHANGED)
    assert dep.dtype == np.uint16
    np.testing.assert_array_equal(dep, depth.astype(np.uint16))


def test_nyuv2_extract(tmp_path):
    root, out = str(tmp_path / "raw"), str(tmp_path / "out")
    seq = "kitchen_0001"
    for i in range(3):
        _write_img(osp.join(root, seq, "rgb", f"rgb_{i:04d}.jpg"), 480, 640)
        _write_png16(osp.join(root, seq, "depth", f"rgb_{i:04d}.png"),
                     480, 640)
    E.extract_nyuv2(root, out)
    m = _load_manifest(osp.join(out, "nyuv2", "nyuv2_video_500.json"))
    entries = m["nyuv2"][0][seq]
    assert len(entries) == 3 and entries[0]["factor"] == 6000.0
    rgb = cv2.imread(osp.join(out, "nyuv2", entries[0]["image"]))
    assert rgb.shape[:2] == (426, 560)  # crop 45:471, 41:601


def test_scannet_extract(tmp_path):
    root, out = str(tmp_path / "raw"), str(tmp_path / "out")
    seq = "scene0000_00"
    K = np.diag([577.0, 577.0, 1.0, 1.0])
    for i in range(4):
        _write_img(osp.join(root, seq, "color", f"{i:04d}.jpg"), 480, 640)
        _write_png16(osp.join(root, seq, "depth", f"{i:04d}.png"), 480, 640)
        pose = np.eye(4)
        pose[0, 3] = i * 0.1
        os.makedirs(osp.join(root, seq, "pose"), exist_ok=True)
        np.savetxt(osp.join(root, seq, "pose", f"{i:04d}.txt"), pose)
    os.makedirs(osp.join(root, seq, "intrinsic"), exist_ok=True)
    np.savetxt(osp.join(root, seq, "intrinsic", "intrinsic_depth.txt"), K)
    E.extract_scannet(root, out)

    m = _load_manifest(osp.join(out, "scannet", "scannet_video.json"))
    entries = m["scannet"][0][seq]
    # stride-3 protocol: frames 0, 3 of the 4 written
    assert len(entries) == 2 and entries[0]["factor"] == 1000.0
    rgb = cv2.imread(osp.join(out, "scannet", entries[0]["image"]))
    assert rgb.shape[:2] == (464, 618)  # crop 8:-8, 11:-11

    tae = _load_manifest(osp.join(out, "scannet", "scannet_video_tae.json"))
    te = tae["scannet"][0][seq]
    assert len(te) == 4
    np.testing.assert_allclose(np.asarray(te[0]["K"]), K)
    assert te[2]["pose"][0][3] == pytest.approx(0.2)
    # TAE protocol uses the UNCROPPED frames
    origin = cv2.imread(osp.join(out, "scannet", te[0]["image"]))
    assert origin.shape[:2] == (480, 640)


def test_sintel_extract_with_camdata_emits_tae_manifest(tmp_path):
    """cam_root extraction: per-frame K/pose from .cam files + a runnable
    sintel TAE manifest (no reference counterpart — its sintel TAE config
    is unusable because its extractor drops camdata)."""
    root, depth_root, cam_root, out = (str(tmp_path / d) for d in
                                       ("raw", "rawd", "cam", "out"))
    seq = "alley_1"
    k_mat = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1.0]])
    for i in range(3):
        name = f"frame_{i:04d}.png"
        _write_img(osp.join(root, seq, name), 48, 64)
        depth = (RNG.random((48, 64)).astype(np.float32) * 100)
        dpt_path = osp.join(depth_root, seq, name[:-3] + "dpt")
        os.makedirs(osp.dirname(dpt_path), exist_ok=True)
        with open(dpt_path, "wb") as f:
            np.float32(u.SINTEL_TAG_FLOAT).tofile(f)
            np.int32(64).tofile(f)
            np.int32(48).tofile(f)
            depth.tofile(f)
        # world-to-cam extrinsic: small per-frame translation
        n_mat = np.hstack([np.eye(3), np.array([[0.1 * i], [0.0], [0.0]])])
        cam_path = osp.join(cam_root, seq, name[:-3] + "cam")
        os.makedirs(osp.dirname(cam_path), exist_ok=True)
        with open(cam_path, "wb") as f:
            np.float32(u.SINTEL_TAG_FLOAT).tofile(f)
            k_mat.astype(np.float64).tofile(f)
            n_mat.astype(np.float64).tofile(f)

    E.extract_sintel(root, depth_root, out, cam_root=cam_root)
    m = _load_manifest(osp.join(out, "sintel", "sintel_video_tae.json"))
    entries = m["sintel"][0][seq]
    assert len(entries) == 3
    e0 = entries[0]
    np.testing.assert_allclose(np.asarray(e0["K"]), k_mat)
    # pose is cam-to-world: inverse of [N; 0 0 0 1]
    pose2 = np.asarray(entries[2]["pose"])
    np.testing.assert_allclose(pose2[:3, 3], [-0.2, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(pose2[:3, :3], np.eye(3), atol=1e-12)

    # the TAE eval must consume this manifest end-to-end: constant depth
    # with identity-rotation poses reprojects consistently -> tiny TAE
    from benchmark.eval.eval_tae import eval_tae_sequence

    gt_paths = [osp.join(out, "sintel", e["gt_depth"]) for e in entries]
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    pred_paths = []
    for i, e in enumerate(entries):
        p = str(pred_dir / f"{i}.npy")
        np.save(p, np.full((48, 64), 2.0, np.float32))
        pred_paths.append(p)
    val = eval_tae_sequence(
        pred_paths, gt_paths, [e["factor"] for e in entries],
        [np.asarray(e["K"]) for e in entries],
        [np.asarray(e["pose"]) for e in entries],
        crop=(0, 48, 0, 64), max_depth=70.0, hard_crop=False)
    assert np.isfinite(val) and val >= 0
