"""End-to-end mock test of the real-checkpoint validation harness.

No downloads: a reference-format .pth is FABRICATED by instantiating the
actual torch reference model (random weights) and torch.save-ing its state
dict — byte-for-byte the format scripts/get_weights.sh fetches.  The
harness must strict-convert it, run both pipelines on the same clip, and
report inter-pipeline delta1 ~ 1.0 (same weights on both sides).
"""

import os
import sys

import numpy as np
import pytest

from tests.conftest import requires_torch

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


@requires_torch
@pytest.mark.slow
def test_validate_checkpoint_harness_end_to_end(tmp_path):
    import torch

    import validate_checkpoint as V
    from tests.torch_ref import import_reference

    import_reference()
    from video_depth_anything.video_depth import VideoDepthAnything

    from vda_tpu.config import get_config

    cfg = get_config("vits")
    with torch.no_grad():
        model = VideoDepthAnything(encoder="vits", features=cfg.features,
                                   out_channels=list(cfg.out_channels))
    # nudge the final conv bias positive: random init can leave the output
    # ReLU dead (all-zero depth), which makes delta1 vacuous
    sd = model.state_dict()
    key = "head.scratch.output_conv2.2.bias"
    sd[key] = sd[key].abs() + 0.1
    ckpt = tmp_path / "video_depth_anything_vits.pth"
    torch.save(sd, str(ckpt))

    result = V.validate(encoder="vits", checkpoint=str(ckpt),
                        n_frames=36, input_size=126, download=False,
                        threshold=0.99, stream_int8=True)
    assert result["ok"]
    assert result["delta1_min"] >= 0.99
    # the int8-vs-bf16 streaming-cache check ran and passed too
    assert result["stream_int8_ok"]
    assert result["stream_int8_delta1_min"] >= 0.99


@requires_torch
def test_validate_checkpoint_refuses_missing_without_download(tmp_path):
    import validate_checkpoint as V

    with pytest.raises(FileNotFoundError):
        V.ensure_checkpoint("vits", False, str(tmp_path / "nope.pth"),
                            download=True)


def test_delta1_aligned_metric():
    import validate_checkpoint as V

    rng = np.random.default_rng(0)
    ref = rng.random((3, 20, 20)) + 0.5
    # affine transform of ref must score 1.0
    got = 2.5 * ref + 1.0
    assert min(V.delta1_aligned(ref, got)) == 1.0
    # uncorrelated noise must not
    assert min(V.delta1_aligned(ref, rng.random((3, 20, 20)) + 0.5)) < 0.9
