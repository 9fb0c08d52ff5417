"""Benchmark dress rehearsal (VERDICT r4 #4): the REAL user-facing chain.

Runs, as subprocesses with no monkeypatching, exactly what a user with real
data would run (reference benchmark/README.md:14-34):

    dataset_extract/extract.py   (4 raw mini-datasets -> canonical layout)
    benchmark/infer/infer.py     (tiny encoder, random init, real windowed
                                  inference -> per-frame .npy)
    sh benchmark/eval/eval.sh    (sintel scannet kitti bonn, verbatim)
    sh benchmark/eval/eval_tae.sh (scannet TAE protocol, verbatim)

and asserts a delta1~1 / TAE~0 results.txt comes out, so any arg/path drift
in the .sh entry points (never otherwise executed — no real benchmark data
in this environment) is caught here instead of on a user's first real run.

delta1~1 construction: after inference the GT depth PNGs are REWRITTEN from
the predictions — per frame, pred is affinely mapped into a disparity band
and inverted to depth, so eval.py's global disparity-space lstsq alignment
(eval.py:94-103) can recover the mapping exactly; the only residual is
uint16 quantization.  This validates the full path/crop/factor/manifest
wiring without needing a trained model.

TAE~0 construction: the scannet scene's frames are IDENTICAL and its poses
identity, so after overwriting every TAE prediction with the first one the
cross-projection (eval_tae.py:54-72) is an exact pixel round trip and the
error is exactly zero.  A first non-doctored pass asserts the real
pred -> eval_tae.sh wiring produces a finite number.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# eval.py crops / factors the GT rewrite must reproduce
from benchmark.dataset_extract.extract_utils import (  # noqa: E402
    DATASET_FACTORS,
    SINTEL_TAG_FLOAT,
)
from benchmark.eval.eval import DATASET_CONFIGS  # noqa: E402


def _sub_env():
    """Subprocess env: CPU jax (drop the axon sitecustomize carried by
    PYTHONPATH — with it JAX_PLATFORMS=cpu is ignored), interpreter-mode
    pallas, quiet logs."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["VDA_PALLAS_INTERPRET"] = "1"
    return env


def _run(cmd, cwd=REPO):
    proc = subprocess.run(cmd, cwd=cwd, env=_sub_env(),
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"{' '.join(str(c) for c in cmd)} failed:\n"
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}")
    return proc


def _write_dpt(path, depth):
    with open(path, "wb") as f:
        np.asarray([SINTEL_TAG_FLOAT], np.float32).tofile(f)
        np.asarray([depth.shape[1], depth.shape[0]], np.int32).tofile(f)
        depth.astype(np.float32).tofile(f)


def _make_raw_datasets(raw):
    """Four raw mini-datasets in the layouts the extractors consume."""
    import cv2

    rng = np.random.default_rng(0)
    h, w = 70, 90

    def img():
        return (rng.random((h, w, 3)) * 255).astype(np.uint8)

    def dep16(factor, lo=0.5, hi=4.0):
        d = lo + rng.random((h, w)) * (hi - lo)
        return np.round(d * factor).astype(np.uint16)

    # kitti: RGB under <date>/<seq>/image_02/data, GT under
    # <seq>/proj_depth/groundtruth/image_02 (extract.py:33-49)
    seq = "2011_09_26_drive_0001_sync"
    krgb = raw / "kitti_rgb" / seq[:10] / seq / "image_02" / "data"
    kdep = raw / "kitti_depth" / seq / "proj_depth" / "groundtruth" / "image_02"
    krgb.mkdir(parents=True)
    kdep.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(krgb / f"{i:010d}.png"), img())
        cv2.imwrite(str(kdep / f"{i:010d}.png"),
                    dep16(DATASET_FACTORS["kitti"], 2.0, 40.0))

    # bonn: <seq>/{rgb,depth} (extract.py:52-67; root == depth_root).
    # 34 frames: the bonn protocol manifest slices [30:140] (gen_json start
    # 30), so fewer than 31 raw frames yields an EMPTY manifest.
    bseq = raw / "bonn" / "rgbd_bonn_balloon"
    (bseq / "rgb").mkdir(parents=True)
    (bseq / "depth").mkdir(parents=True)
    for i in range(34):
        cv2.imwrite(str(bseq / "rgb" / f"frame_{i:04d}.png"), img())
        cv2.imwrite(str(bseq / "depth" / f"frame_{i:04d}.png"),
                    dep16(DATASET_FACTORS["bonn"]))

    # sintel: clean pass pngs + .dpt float depths (extract.py:70-118)
    srgb = raw / "sintel_clean" / "alley_1"
    sdep = raw / "sintel_depth" / "alley_1"
    srgb.mkdir(parents=True)
    sdep.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(srgb / f"frame_{i:04d}.png"), img())
        _write_dpt(sdep / f"frame_{i:04d}.dpt",
                   (0.5 + rng.random((h, w)) * 30.0)
                   * DATASET_FACTORS["sintel"])

    # scannet: <scene>/{color,depth,pose,intrinsic} — IDENTICAL frames +
    # identity poses so the doctored TAE pass is exactly zero.  12 frames:
    # eval_tae.sh slices 10:180, leaving 2 (the protocol minimum).
    scn = raw / "scannet" / "scene0000_00"
    for sub in ("color", "depth", "pose", "intrinsic"):
        (scn / sub).mkdir(parents=True)
    frame = img()
    depth = dep16(DATASET_FACTORS["scannet"])
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 60.0
    k[0, 2], k[1, 2] = (w - 1) / 2.0, (h - 1) / 2.0
    np.savetxt(str(scn / "intrinsic" / "intrinsic_depth.txt"), k)
    for i in range(12):
        cv2.imwrite(str(scn / "color" / f"{i:04d}.jpg"), frame)
        cv2.imwrite(str(scn / "depth" / f"{i:04d}.png"), depth)
        np.savetxt(str(scn / "pose" / f"{i:04d}.txt"), np.eye(4))


def _rewrite_gt_from_preds(bench_root, preds_root, dataset):
    """Make GT an exact affine-in-disparity image of the predictions
    (modulo uint16 rounding), through eval.py's own loaders."""
    import cv2

    from benchmark.eval.eval import base_dataset, iter_manifest

    cfg = DATASET_CONFIGS[dataset]
    base = base_dataset(dataset)
    json_file = os.path.join(bench_root, cfg.json_name)
    a, b, c, d = cfg.crop
    for _name, entries in iter_manifest(json_file, base):
        # eval.py fits ONE scale/shift for the whole sequence
        # (align_disparity_lstsq over all frames) — the affine map here must
        # therefore be GLOBAL per scene, not per frame
        preds = []
        for e in entries:
            pred_path = (os.path.join(preds_root, base, e["image"])
                         .replace(".jpg", ".npy").replace(".png", ".npy"))
            # eval.py clips preds the same way before aligning
            preds.append(np.clip(np.load(pred_path).astype(np.float64),
                                 1e-3, None))
        lo = min(float(p.min()) for p in preds)
        hi = max(float(p.max()) for p in preds)
        for e, pred in zip(entries, preds):
            disp = 0.5 + (pred - lo) / ((hi - lo) or 1.0) * 1.5
            gt_path = os.path.join(bench_root, base, e["gt_depth"])
            old = cv2.imread(gt_path, -1)
            new = np.zeros_like(old)
            region = new[a:b, c:d]
            assert region.shape == pred.shape, (
                f"{dataset}: crop {region.shape} vs pred {pred.shape}")
            new[a:b, c:d] = np.round((1.0 / disp) * e["factor"]) \
                .astype(old.dtype)
            cv2.imwrite(gt_path, new)


def _parse_results(path):
    """results.txt -> {dataset: {metric: value}} (+ 'tae' floats list)."""
    out, cur, taes = {}, None, []
    with open(path) as f:
        for line in f:
            m = re.match(r"<-+ (\w+) start", line)
            if m:
                cur = m.group(1)
                out[cur] = {}
            elif re.match(r"<-+ \w+ finish", line):
                cur = None
            elif cur and ":" in line:
                k, v = line.split(":")
                out[cur][k.strip()] = float(v)
            elif re.match(r"scannet: ", line):  # eval_tae.py:166 format
                taes.append(float(line.split(":")[1]))
    out["tae_runs"] = taes
    return out


@pytest.mark.slow
def test_benchmark_shell_chain(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    _make_raw_datasets(raw)
    bench_root = tmp_path / "benchmark_root"
    preds = tmp_path / "preds"

    # 1. extraction CLIs (reference dataset_extract_{kitti,bonn,sintel,scannet})
    ex = os.path.join(REPO, "benchmark/dataset_extract/extract.py")
    _run([sys.executable, ex, "kitti", "--root", str(raw / "kitti_rgb"),
          "--depth-root", str(raw / "kitti_depth"),
          "--saved-dir", str(bench_root)])
    _run([sys.executable, ex, "bonn", "--root", str(raw / "bonn"),
          "--saved-dir", str(bench_root)])
    _run([sys.executable, ex, "sintel", "--root", str(raw / "sintel_clean"),
          "--depth-root", str(raw / "sintel_depth"),
          "--saved-dir", str(bench_root)])
    _run([sys.executable, ex, "scannet", "--root", str(raw / "scannet"),
          "--saved-dir", str(bench_root)])

    # 2. real inference (subprocess, tiny encoder, random init) over every
    # manifest eval.sh / eval_tae.sh consumes
    inf = os.path.join(REPO, "benchmark/infer/infer.py")
    for ds in ("sintel", "scannet", "kitti", "bonn"):
        _run([sys.executable, inf, "--infer_path", str(preds),
              "--json_file", str(bench_root / ds / f"{ds}_video.json"),
              "--datasets", ds, "--encoder", "tiny", "--random-init",
              "--input_size", "56"])
    _run([sys.executable, inf, "--infer_path", str(preds),
          "--json_file", str(bench_root / "scannet"
                             / "scannet_video_tae.json"),
          "--datasets", "scannet", "--encoder", "tiny", "--random-init",
          "--input_size", "56"])

    # 3. GT rewrite -> delta1 must come out ~1 through the real eval.sh
    for ds in ("sintel", "scannet", "kitti", "bonn"):
        _rewrite_gt_from_preds(str(bench_root), str(preds), ds)
    _run(["sh", "benchmark/eval/eval.sh", str(preds), str(bench_root)])

    # 4. TAE: once with the real predictions (wiring: finite number out),
    # then with every pred identical (exact-zero protocol check)
    _run(["sh", "benchmark/eval/eval_tae.sh", str(preds), str(bench_root)])
    tae_npys = sorted((preds / "scannet" / "scene0000_00"
                       / "color_origin").glob("*.npy"))
    assert len(tae_npys) == 12
    first = np.load(tae_npys[0])
    for p in tae_npys[1:]:
        np.save(p, first)
    _run(["sh", "benchmark/eval/eval_tae.sh", str(preds), str(bench_root)])

    res = _parse_results(preds / "results.txt")
    for ds in ("sintel", "scannet", "kitti", "bonn"):
        assert res[ds]["delta1_acc"] > 0.995, (ds, res[ds])
        assert res[ds]["abs_relative_difference"] < 0.03, (ds, res[ds])
    assert len(res["tae_runs"]) == 2
    assert np.isfinite(res["tae_runs"][0])
    assert res["tae_runs"][1] < 0.05, res["tae_runs"]
