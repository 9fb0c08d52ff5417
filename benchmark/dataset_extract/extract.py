#!/usr/bin/env python
"""Dataset extraction CLI: raw benchmark datasets -> canonical layout + manifests.

Consolidated rebuild of the five reference extractors
(benchmark/dataset_extract/dataset_extract_{kitti,sintel,bonn,nyuv2,scannet}.py)
behind one registry.  Frame-window protocols match the reference:

    kitti   : manifests 0:110 and 0:500
    bonn    : manifests 30:140 and 0:500
    sintel  : manifest 0:100 (depth from .dpt floats, stored as uint16 png)
    nyuv2   : manifest 0:500 (crop 45:471, 41:601 at extraction)
    scannet : first 100 scenes, 510 frames; manifests 0:270:3 (90 frames),
              0:500, and the TAE manifest 0:192 with K+pose
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil

import numpy as np

try:
    from benchmark.dataset_extract import extract_utils as u
except ImportError:
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import extract_utils as u


def extract_kitti(root, depth_root, saved_dir, dataset_name="kitti"):
    for seq_name in sorted(os.listdir(depth_root)):
        gt_dir = osp.join(depth_root, seq_name,
                          "proj_depth/groundtruth/image_02")
        for img_name in u.get_sorted_files(gt_dir, ".png"):
            u.copy_crop_files(
                osp.join(root, seq_name[0:10], seq_name, "image_02/data",
                         img_name),
                osp.join(gt_dir, img_name),
                osp.join(saved_dir, dataset_name, seq_name, "rgb", img_name),
                osp.join(saved_dir, dataset_name, seq_name, "depth", img_name),
                dataset_name)
    out = osp.join(saved_dir, dataset_name)
    u.gen_json(out, dataset_name, 0, 110, 1,
               osp.join(out, "kitti_video.json"))
    u.gen_json(out, dataset_name, 0, 500, 1,
               osp.join(out, "kitti_video_500.json"))


def extract_bonn(root, depth_root, saved_dir, dataset_name="bonn"):
    for seq_name in sorted(os.listdir(depth_root)):
        imgs = u.get_sorted_files(osp.join(depth_root, seq_name, "rgb"), ".png")
        deps = u.get_sorted_files(osp.join(depth_root, seq_name, "depth"),
                                  ".png")
        for img_name, dep_name in zip(imgs, deps):
            u.copy_crop_files(
                osp.join(root, seq_name, "rgb", img_name),
                osp.join(depth_root, seq_name, "depth", dep_name),
                osp.join(saved_dir, dataset_name, seq_name, "rgb", img_name),
                osp.join(saved_dir, dataset_name, seq_name, "depth", dep_name),
                dataset_name)
    out = osp.join(saved_dir, dataset_name)
    u.gen_json(out, dataset_name, 30, 140, 1, osp.join(out, "bonn_video.json"))
    u.gen_json(out, dataset_name, 0, 500, 1,
               osp.join(out, "bonn_video_500.json"))


def extract_sintel(root, depth_root, saved_dir, dataset_name="sintel",
                   cam_root=None):
    """NOTE: the reference extractor (dataset_extract_sintel.py:76-96) writes
    a type-major layout (sintel/clean/<scene>/, sintel/depth/<scene>/) that
    its own gen_json (eval_utils.py:37-48, scene-major glob) cannot read —
    it would emit empty manifests.  This rebuild writes the scene-major
    canonical layout (<scene>/clean/, <scene>/depth/) that gen_json and the
    eval pipeline actually consume.

    cam_root (MPI-Sintel ``training/camdata_left``): when given, per-frame
    K and camera-to-world pose files are extracted from the ``.cam`` files
    and a ``sintel_video_tae.json`` TAE manifest is emitted — closing the
    reference's unusable sintel TAE config (its extractor drops camdata,
    reference eval_tae.py:223-249 only wires scannet)."""
    import cv2
    from PIL import Image

    for seq_name in sorted(os.listdir(root)):
        for img_name in u.get_sorted_files(osp.join(root, seq_name), ".png"):
            depth = u.read_sintel_dpt(
                osp.join(depth_root, seq_name, img_name[:-3] + "dpt"))
            img = np.array(Image.open(osp.join(root, seq_name, img_name)))
            out_img = osp.join(saved_dir, dataset_name, seq_name, "clean",
                               img_name)
            out_dep = osp.join(saved_dir, dataset_name, seq_name, "depth",
                               img_name[:-3] + "png")
            os.makedirs(osp.dirname(out_img), exist_ok=True)
            os.makedirs(osp.dirname(out_dep), exist_ok=True)
            cv2.imwrite(out_img, img)
            cv2.imwrite(out_dep, depth.astype(np.uint16))
            if cam_root is not None:
                cam_path = osp.join(cam_root, seq_name,
                                    img_name[:-3] + "cam")
                k, n = u.read_sintel_cam(cam_path)
                stem = img_name[:-4]
                out_k = osp.join(saved_dir, dataset_name, seq_name,
                                 "intrinsic", stem + ".txt")
                out_pose = osp.join(saved_dir, dataset_name, seq_name,
                                    "pose", stem + ".txt")
                os.makedirs(osp.dirname(out_k), exist_ok=True)
                os.makedirs(osp.dirname(out_pose), exist_ok=True)
                np.savetxt(out_k, k)
                np.savetxt(out_pose, u.sintel_cam_to_pose(n))
    out = osp.join(saved_dir, dataset_name)
    u.gen_json(out, dataset_name, 0, 100, 1,
               osp.join(out, "sintel_video.json"))
    if cam_root is not None:
        u.gen_json_sintel_tae(out, 0, 100, 1,
                              osp.join(out, "sintel_video_tae.json"))


def extract_nyuv2(root, saved_dir, dataset_name="nyuv2"):
    for seq_name in sorted(os.listdir(root)):
        for img_name in u.get_sorted_files(osp.join(root, seq_name, "rgb"),
                                           ".jpg"):
            u.copy_crop_files(
                osp.join(root, seq_name, "rgb", img_name),
                osp.join(root, seq_name, "depth", img_name[:-3] + "png"),
                osp.join(saved_dir, dataset_name, seq_name, "rgb", img_name),
                osp.join(saved_dir, dataset_name, seq_name, "depth",
                         img_name[:-3] + "png"),
                dataset_name)
    out = osp.join(saved_dir, dataset_name)
    u.gen_json(out, dataset_name, 0, 500, 1,
               osp.join(out, "nyuv2_video_500.json"))


def extract_scannet(root, saved_dir, dataset_name="scannet"):
    import cv2
    from PIL import Image

    for seq_name in sorted(os.listdir(root))[:100]:
        img_names = u.get_sorted_files(osp.join(root, seq_name, "color"),
                                       ".jpg")[:510]
        for img_name in img_names:
            im_path = osp.join(root, seq_name, "color", img_name)
            u.copy_crop_files(
                im_path,
                osp.join(root, seq_name, "depth", img_name[:-3] + "png"),
                osp.join(saved_dir, dataset_name, seq_name, "color", img_name),
                osp.join(saved_dir, dataset_name, seq_name, "depth",
                         img_name[:-3] + "png"),
                dataset_name)
            # uncropped copy + pose for the TAE protocol
            out_origin = osp.join(saved_dir, dataset_name, seq_name,
                                  "color_origin", img_name)
            out_pose = osp.join(saved_dir, dataset_name, seq_name, "pose",
                                img_name[:-3] + "txt")
            os.makedirs(osp.dirname(out_origin), exist_ok=True)
            os.makedirs(osp.dirname(out_pose), exist_ok=True)
            cv2.imwrite(out_origin, np.array(Image.open(im_path)))
            shutil.copyfile(
                osp.join(root, seq_name, "pose", img_name[:-3] + "txt"),
                out_pose)
        out_intr = osp.join(saved_dir, dataset_name, seq_name, "intrinsic",
                            "intrinsic_depth.txt")
        os.makedirs(osp.dirname(out_intr), exist_ok=True)
        shutil.copyfile(
            osp.join(root, seq_name, "intrinsic", "intrinsic_depth.txt"),
            out_intr)
    out = osp.join(saved_dir, dataset_name)
    u.gen_json(out, dataset_name, 0, 90 * 3, 3,
               osp.join(out, "scannet_video.json"))
    u.gen_json(out, dataset_name, 0, 500, 1,
               osp.join(out, "scannet_video_500.json"))
    u.gen_json_scannet_tae(out, 0, 192,
                           1, osp.join(out, "scannet_video_tae.json"))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset",
                        choices=["kitti", "bonn", "sintel", "nyuv2",
                                 "scannet"])
    parser.add_argument("--root", required=True,
                        help="raw dataset root (RGB)")
    parser.add_argument("--depth-root", default=None,
                        help="raw GT depth root (kitti/bonn/sintel)")
    parser.add_argument("--cam-root", default=None,
                        help="sintel camdata_left root: also extract K/pose "
                             "and emit the sintel TAE manifest")
    parser.add_argument("--saved-dir", default="./benchmark/datasets/")
    args = parser.parse_args(argv)

    if args.dataset == "kitti":
        extract_kitti(args.root, args.depth_root or args.root, args.saved_dir)
    elif args.dataset == "bonn":
        extract_bonn(args.root, args.depth_root or args.root, args.saved_dir)
    elif args.dataset == "sintel":
        extract_sintel(args.root, args.depth_root or args.root,
                       args.saved_dir, cam_root=args.cam_root)
    elif args.dataset == "nyuv2":
        extract_nyuv2(args.root, args.saved_dir)
    elif args.dataset == "scannet":
        extract_scannet(args.root, args.saved_dir)


if __name__ == "__main__":
    main()
