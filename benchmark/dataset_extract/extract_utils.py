"""Shared dataset-extraction utilities.

Rebuild of reference benchmark/dataset_extract/eval_utils.py: converts raw
benchmark datasets into the canonical layout

    <saved_dir>/<dataset>/<scene>/{rgb|color|clean}/  depth/  [pose/ intrinsic/]

and emits JSON manifests {dataset: [{scene: [{image, gt_depth, factor
[, K, pose]}]}]} with the per-dataset depth scale factors and crops
(reference eval_utils.py:18-62, 120-139).
"""

from __future__ import annotations

import glob
import json
import os
import os.path as osp
import re
import shutil

import numpy as np

# reference eval_utils.py:18-32
DATASET_FACTORS = {
    "kitti": 256.0,
    "nyuv2": 6000.0,
    "bonn": 5000.0,
    "sintel": 65535 / 650,
    "scannet": 1000.0,
}
DATASET_RGB_DIR = {
    "kitti": "rgb",
    "nyuv2": "rgb",
    "bonn": "rgb",
    "sintel": "clean",
    "scannet": "color",
}


def even_or_odd(num: int) -> int:
    return num if num % 2 == 0 else num - 1


def natural_sorted(names):
    """Natural (numeric-aware) sort without the natsort dependency."""
    def key(s):
        return [int(p) if p.isdigit() else p
                for p in re.split(r"(\d+)", str(s))]
    return sorted(names, key=key)


def get_sorted_files(root: str, suffix: str):
    """Frame filenames sorted by their trailing 4-digit index
    (reference eval_utils.py:111-118)."""
    names = [x for x in os.listdir(root) if x.endswith(suffix)]
    names.sort()
    return sorted(names, key=lambda x: int(x.split(".")[0][-4:]))


def crop_for_dataset(img: np.ndarray, dataset: str) -> np.ndarray:
    """Canonical-crop rules (reference eval_utils.py:120-133)."""
    if dataset in ("kitti", "bonn"):
        h, w = img.shape[:2]
        return img[:even_or_odd(h), :even_or_odd(w)]
    if dataset == "nyuv2":
        return img[45:471, 41:601, :]
    if dataset == "scannet":
        return img[8:-8, 11:-11, :]
    return img


def copy_crop_files(im_path: str, depth_path: str, out_img_path: str,
                    out_depth_path: str, dataset: str) -> None:
    import cv2
    from PIL import Image

    img = crop_for_dataset(np.array(Image.open(im_path)), dataset)
    os.makedirs(osp.dirname(out_img_path), exist_ok=True)
    os.makedirs(osp.dirname(out_depth_path), exist_ok=True)
    cv2.imwrite(out_img_path, img)
    shutil.copyfile(depth_path, out_depth_path)


def gen_json(root_path: str, dataset: str, start_id: int, end_id: int,
             step: int, save_path: str) -> None:
    """Canonical-layout -> manifest (reference eval_utils.py:18-62)."""
    factor = DATASET_FACTORS[dataset]
    rgb_name = DATASET_RGB_DIR[dataset]
    data = {dataset: []}
    for piece in glob.glob(osp.join(root_path, "*")):
        if not osp.isdir(piece):
            continue
        name = osp.basename(piece)
        images = natural_sorted(
            glob.glob(osp.join(piece, rgb_name, "*.png"))
            + glob.glob(osp.join(piece, rgb_name, "*.jpg")))
        depths = natural_sorted(glob.glob(osp.join(piece, "depth", "*.png")))
        images = images[start_id:end_id:step]
        depths = depths[start_id:end_id:step]
        entries = [
            {
                "image": img[len(root_path) + 1:],
                "gt_depth": dep[len(root_path) + 1:],
                "factor": factor,
            }
            for img, dep in zip(images, depths)
        ]
        data[dataset].append({name: entries})
    with open(save_path, "w") as f:
        json.dump(data, f, indent=4)


def gen_json_scannet_tae(root_path: str, start_id: int, end_id: int,
                         step: int, save_path: str) -> None:
    """TAE manifest with K + pose per frame (reference eval_utils.py:65-109)."""
    data = {"scannet": []}
    color = "color_origin"
    for piece in glob.glob(osp.join(root_path, "*")):
        if not osp.isdir(piece):
            continue
        name = osp.basename(piece)
        images = natural_sorted(glob.glob(osp.join(piece, color, "*.jpg")))
        depths = natural_sorted(glob.glob(osp.join(piece, "depth", "*.png")))
        images = images[start_id:end_id:step]
        depths = depths[start_id:end_id:step]
        entries = []
        for img, dep in zip(images, depths):
            k = np.loadtxt(osp.join(osp.dirname(img).replace(color, "intrinsic"),
                                    "intrinsic_depth.txt"))
            pose = np.loadtxt(img.replace(color, "pose")
                              .replace(".jpg", ".txt"))
            entries.append({
                "image": img[len(root_path) + 1:],
                "gt_depth": dep[len(root_path) + 1:],
                "factor": 1000.0,
                "K": k.tolist(),
                "pose": pose.tolist(),
            })
        data["scannet"].append({name: entries})
    with open(save_path, "w") as f:
        json.dump(data, f, indent=4)


# Sintel ".dpt" float file reader (reference dataset_extract_sintel.py:26-44)
SINTEL_TAG_FLOAT = 202021.25


def read_sintel_dpt(filename: str) -> np.ndarray:
    with open(filename, "rb") as f:
        check = np.fromfile(f, dtype=np.float32, count=1)[0]
        if check != SINTEL_TAG_FLOAT:
            raise ValueError(f"bad .dpt tag in {filename}: {check}")
        width = int(np.fromfile(f, dtype=np.int32, count=1)[0])
        height = int(np.fromfile(f, dtype=np.int32, count=1)[0])
        if not (0 < width and 0 < height and 1 < width * height < 100000000):
            raise ValueError(f"bad .dpt size in {filename}")
        return np.fromfile(f, dtype=np.float32, count=-1) \
            .reshape((height, width))


def read_sintel_cam(filename: str):
    """MPI-Sintel ``.cam`` reader (camdata_left): returns (K (3,3),
    N (3,4) world-to-camera extrinsic), float64.  Format: TAG_FLOAT then
    the two row-major float64 matrices (Sintel toolkit sintel_io.cam_read)."""
    with open(filename, "rb") as f:
        check = np.fromfile(f, dtype=np.float32, count=1)[0]
        if check != SINTEL_TAG_FLOAT:
            raise ValueError(f"bad .cam tag in {filename}: {check}")
        m = np.fromfile(f, dtype=np.float64, count=9).reshape(3, 3)
        n = np.fromfile(f, dtype=np.float64, count=12).reshape(3, 4)
    return m, n


def sintel_cam_to_pose(n: np.ndarray) -> np.ndarray:
    """World-to-camera (3,4) extrinsic -> (4,4) camera-to-world pose, the
    convention the TAE manifests carry (scannet pose files are cam-to-world;
    eval_tae composes t_2_1 = inv(T2) @ T1 on that convention)."""
    t = np.eye(4)
    t[:3, :4] = n
    return np.linalg.inv(t)


def gen_json_sintel_tae(root_path: str, start_id: int, end_id: int,
                        step: int, save_path: str) -> None:
    """Sintel TAE manifest with per-frame K + pose.

    No reference counterpart: the reference's TAE protocol only configures
    scannet (reference eval_tae.py:223-249) and its sintel extractor drops
    the camdata entirely, leaving its sintel TAE config unusable (KeyError).
    This closes that hole using the per-frame K/pose files written by
    ``extract.extract_sintel(cam_root=...)``."""
    data = {"sintel": []}
    for piece in glob.glob(osp.join(root_path, "*")):
        if not osp.isdir(piece):
            continue
        name = osp.basename(piece)
        images = natural_sorted(glob.glob(osp.join(piece, "clean", "*.png")))
        depths = natural_sorted(glob.glob(osp.join(piece, "depth", "*.png")))
        images = images[start_id:end_id:step]
        depths = depths[start_id:end_id:step]
        entries = []
        for img, dep in zip(images, depths):
            stem = osp.splitext(osp.basename(img))[0]
            k_path = osp.join(piece, "intrinsic", stem + ".txt")
            pose_path = osp.join(piece, "pose", stem + ".txt")
            if not (osp.exists(k_path) and osp.exists(pose_path)):
                entries = []
                break  # scene extracted without camdata: skip it
            entries.append({
                "image": img[len(root_path) + 1:],
                "gt_depth": dep[len(root_path) + 1:],
                "factor": DATASET_FACTORS["sintel"],
                "K": np.loadtxt(k_path).tolist(),
                "pose": np.loadtxt(pose_path).tolist(),
            })
        if entries:
            data["sintel"].append({name: entries})
    with open(save_path, "w") as f:
        json.dump(data, f, indent=4)
