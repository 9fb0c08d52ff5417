"""Drive the optional-dependency app paths with stubbed dependencies.

The gradio demo (apps/app.py, reference app.py:39-59) and the EXR->ProRes
converter's encode step (apps/engine/exr_to_prores.py, reference
exr_to_prores_converter.py:192-259) depend on packages/binaries absent here
(gradio, ffmpeg).  These tests execute the real code paths end-to-end against
minimal stand-ins: a recording stub for the gradio module and a fake ffmpeg
executable on PATH.
"""

import os
import stat
import sys
import types

import numpy as np


# ---------------------------------------------------------------------------
# gradio demo
# ---------------------------------------------------------------------------

def _make_gradio_stub(captured):
    """Minimal gradio lookalike: context managers + widgets are no-ops; the
    Button.click wiring records the inference callback for the test."""
    gr = types.ModuleType("gradio")

    class _Ctx:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class _Widget:
        def __init__(self, *a, **k):
            pass

    class _Button(_Widget):
        def click(self, fn, inputs, outputs):
            captured["fn"] = fn

    gr.Blocks = _Ctx
    gr.Row = _Ctx
    gr.Column = _Ctx
    gr.Markdown = _Widget
    gr.Video = _Widget
    gr.Slider = _Widget
    gr.Button = _Button
    return gr


def test_gradio_demo_end_to_end(tmp_path, monkeypatch):
    captured = {}
    monkeypatch.setitem(sys.modules, "gradio", _make_gradio_stub(captured))

    from vda_tpu.utils.io import read_video_frames, save_video

    video = str(tmp_path / "in.mp4")
    rng = np.random.default_rng(0)
    frames_in = (rng.random((8, 70, 90, 3)) * 255).astype(np.uint8)
    save_video(frames_in, video, fps=10)

    from apps.app import build_demo

    demo = build_demo("tiny", random_init=True, input_size=56)
    assert demo is not None and "fn" in captured

    src, vis = captured["fn"](video, max_len=8, target_fps=-1, max_res=1280)
    for out in (src, vis):
        assert os.path.exists(out) and os.path.getsize(out) > 0
        decoded, _fps = read_video_frames(out, -1, -1, 1280)
        assert decoded.shape[1:3] == (70, 90) and len(decoded) >= 1


# ---------------------------------------------------------------------------
# EXR -> ProRes
# ---------------------------------------------------------------------------

def _fake_exr_frames(d, monkeypatch, n=3):
    """This cv2 build has no EXR codec (the engine's EXR->PNG fallback exists
    for the same reason), so write .exr-named .npy payloads and shim
    cv2.imread for them — every other step (display transform, 16-bit PNG
    write, ffmpeg invocation) runs for real."""
    import cv2

    rng = np.random.default_rng(1)
    arrays = {}
    for i in range(n):
        img = rng.random((24, 32)).astype(np.float32)
        path = str(d / f"depth_{i:04d}.exr")
        np.save(path + ".npy", img)
        arrays[path] = img

    real_imread = cv2.imread

    def imread(path, flags=None):
        if str(path).endswith(".exr"):
            return np.load(str(path) + ".npy")
        return real_imread(path, flags)

    monkeypatch.setattr(cv2, "imread", imread)
    for i in range(n):  # list_exr_frames globs *.exr
        (d / f"depth_{i:04d}.exr").touch()
    return arrays


def test_exr_to_prores_with_fake_ffmpeg(tmp_path, monkeypatch):
    """Full encode path: display transform -> temp PNGs -> ffmpeg command.
    The fake ffmpeg validates the ProRes arguments and writes the .mov."""
    exr_dir = tmp_path / "exr"
    exr_dir.mkdir()
    _fake_exr_frames(exr_dir, monkeypatch)

    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    log = tmp_path / "ffmpeg_args.json"
    fake = bin_dir / "ffmpeg"
    fake.write_text(
        "#!/bin/sh\n"
        f"printf '%s\\n' \"$@\" > {log}\n"
        "out=''\n"
        "for a in \"$@\"; do out=\"$a\"; done\n"
        "echo fake-prores > \"$out\"\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")

    from apps.engine.exr_to_prores import convert

    out = str(tmp_path / "out.mov")
    result = convert(str(exr_dir), out, fps=24.0, profile="hq")
    assert result["status"] == "success" and result["frames"] == 3
    assert os.path.exists(out)
    args = log.read_text().splitlines()
    assert "prores_ks" in args and "yuv422p10le" in args
    assert args[args.index("-profile:v") + 1] == "3"  # HQ

    # LT profile maps to ffmpeg profile 1
    result = convert(str(exr_dir), out, fps=24.0, profile="lt")
    args = log.read_text().splitlines()
    assert args[args.index("-profile:v") + 1] == "1"


def test_exr_to_prores_without_ffmpeg(tmp_path, monkeypatch):
    """No ffmpeg: display-transformed 16-bit PNG frames are kept."""
    exr_dir = tmp_path / "exr"
    exr_dir.mkdir()
    exrs = _fake_exr_frames(exr_dir, monkeypatch)
    monkeypatch.setenv("PATH", str(tmp_path / "empty"))

    from apps.engine.exr_to_prores import convert

    out = str(tmp_path / "out.mov")
    result = convert(str(exr_dir), out)
    assert result["status"] == "partial"
    kept = out + "_frames"
    pngs = sorted(os.listdir(kept))
    assert len(pngs) == 3 and pngs[0].endswith(".png")

    import cv2

    png = cv2.imread(os.path.join(kept, pngs[0]), cv2.IMREAD_UNCHANGED)
    assert png.dtype == np.uint16
    # gamma 2.2 display transform applied (values pushed up vs linear)
    exr = exrs[str(exr_dir / "depth_0000.exr")]
    lin16 = np.clip(exr, 0, 1) * 65535.0
    assert float(png[..., 0].mean()) > float(lin16.mean())


def test_cli_main(tmp_path, monkeypatch):
    exr_dir = tmp_path / "exr"
    exr_dir.mkdir()
    _fake_exr_frames(exr_dir, monkeypatch, n=2)
    monkeypatch.setenv("PATH", str(tmp_path / "empty"))

    from apps.engine.exr_to_prores import main

    rc = main([str(exr_dir), str(tmp_path / "o.mov"), "--fps", "12"])
    assert rc == 0
