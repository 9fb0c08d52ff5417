"""Inverse checkpoint conversion: pytree -> reference-format state dict.

A model fine-tuned here must be loadable by the reference's
``load_state_dict(strict=True)`` (reference run.py:50-54).  The export is a
pure layout inverse, so convert(export(p)) must round-trip BIT-EXACTLY.
"""

import numpy as np
import pytest

import jax

from tests.conftest import requires_torch
from vda_tpu.config import get_config
from vda_tpu.models import init_video_depth_anything
from vda_tpu.utils.convert import convert_state_dict, export_state_dict


def _assert_trees_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert len(fa) == len(fb)
    for (ka, la), (kb, lb) in zip(fa, fb):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(ka))


def test_export_roundtrip_tiny(tiny_cfg):
    params = init_video_depth_anything(jax.random.PRNGKey(0), tiny_cfg)
    sd = export_state_dict(params, tiny_cfg)
    # the exported dict is flat numpy fp32 with reference key roots
    assert all(isinstance(v, np.ndarray) and v.dtype == np.float32
               for v in sd.values())
    assert any(k.startswith("pretrained.blocks.0.attn.qkv") for k in sd)
    assert any("pos_encoder.pe" in k for k in sd)  # tiny cfg is APE
    back = convert_state_dict(sd, tiny_cfg, strict=True)
    _assert_trees_equal(params, back)


def test_export_roundtrip_tp_layout(tiny_cfg):
    """TP-layout params export transparently (auto from_tp_layout)."""
    from vda_tpu.parallel.mesh import to_tp_layout

    params = init_video_depth_anything(jax.random.PRNGKey(1), tiny_cfg)
    sd = export_state_dict(to_tp_layout(params), tiny_cfg)
    back = convert_state_dict(sd, tiny_cfg, strict=True)
    _assert_trees_equal(params, back)


@requires_torch
def test_save_torch_checkpoint_roundtrip(tiny_cfg, tmp_path):
    from vda_tpu.utils.convert import load_torch_checkpoint, save_torch_checkpoint

    params = init_video_depth_anything(jax.random.PRNGKey(2), tiny_cfg)
    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(path, params, tiny_cfg)
    back = load_torch_checkpoint(path, tiny_cfg)
    _assert_trees_equal(params, back)


@requires_torch
@pytest.mark.slow
def test_reference_strict_load_of_export():
    """The actual torch reference model must strict-load an exported dict at
    a production size (vits), and its state dict must round-trip through
    convert -> export bit-exactly (keys AND values)."""
    import torch

    from tests.torch_ref import import_reference
    import_reference()
    from video_depth_anything.video_depth import VideoDepthAnything

    with torch.no_grad():
        model = VideoDepthAnything(encoder="vits", features=64,
                                   out_channels=[48, 96, 192, 384])
    sd_ref = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = get_config("vits")
    params = convert_state_dict(sd_ref, cfg, strict=True)
    sd_out = export_state_dict(params, cfg)

    assert set(sd_out) == set(sd_ref)
    for k in sd_ref:
        np.testing.assert_array_equal(sd_out[k], sd_ref[k], err_msg=k)

    # and torch accepts it strictly
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd_out.items()}, strict=True)
    assert not missing and not unexpected
