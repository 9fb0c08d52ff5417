"""Full-scale checkpoint compatibility: the strict converter must consume a
REAL vitl-structure state dict.

Without network egress the published `.pth` weights can't be downloaded, but
checkpoint compatibility is a structural property: build the actual torch
reference model at every production size (reference run.py:45-54 configs),
take its state_dict — byte-for-byte the key/shape set a shipped checkpoint
has — and require `convert_state_dict(strict=True)` to consume every key and
produce every expected pytree leaf with the converted layouts.
"""

import numpy as np
import pytest

from tests.conftest import requires_torch
from vda_tpu.config import get_config
from vda_tpu.utils.convert import convert_state_dict


@requires_torch
@pytest.mark.slow
@pytest.mark.parametrize("encoder,features,out_channels", [
    ("vits", 64, [48, 96, 192, 384]),
    ("vitl", 256, [256, 512, 1024, 1024]),   # flagship: 381.8M params
])
def test_reference_state_dict_converts_strict(encoder, features,
                                              out_channels):
    import torch

    from tests.torch_ref import import_reference
    import_reference()
    from video_depth_anything.video_depth import VideoDepthAnything

    with torch.no_grad():
        model = VideoDepthAnything(encoder=encoder, features=features,
                                   out_channels=out_channels)
    sd = model.state_dict()
    n_params = sum(v.numel() for v in sd.values())

    cfg = get_config(encoder)
    params = convert_state_dict(sd, cfg, strict=True)  # raises on any drift

    # every converted leaf accounted for: the ONLY dropped entries are the
    # deterministic sinusoidal pos_encoder.pe buffers (recomputed on the fly,
    # convert.py) — 2 per temporal module, (1, max_len, C) each
    import jax

    n_leaves = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    n_pe = sum(int(np.prod(v.shape)) for k, v in sd.items()
               if "pos_encoder.pe" in k)
    assert n_pe > 0
    assert n_leaves == n_params - n_pe

    # spot-check the layout conversions at full scale
    d = cfg.vit.embed_dim
    blk = params["pretrained"]["blocks"][0]
    assert blk["attn"]["qkv"]["w"].shape == (d, 3 * d)      # (in, out)
    assert params["pretrained"]["patch_embed"]["w"].shape == (14, 14, 3, d)
    assert params["head"]["output_conv2"]["conv0"]["w"].shape[3] == 32
    mm = params["head"]["motion_modules"][0]
    assert mm["proj_out"]["w"].shape == (out_channels[2], out_channels[2])
    np.testing.assert_array_equal(np.asarray(mm["proj_out"]["w"]), 0.0)

    if encoder == "vitl":
        assert n_params > 370e6  # the published checkpoint's 381.8M scale


@requires_torch
@pytest.mark.slow
def test_vitg_state_dict_converts_strict():
    """vitg completeness (VERDICT r2 #7): the reference factory builds the
    swiglufused giant encoder (reference dinov2.py:381-414) but ships no
    head config for it; a vitg checkpoint would pair it with the
    DA-family giant head (MODEL_CONFIGS['vitg']).  Compose exactly that
    state dict at full scale and require a strict conversion, exercising
    the swiglu w12/w3 key mapping (reference swiglu_ffn.py:20-40)."""
    import torch

    from tests.torch_ref import import_reference
    import_reference()
    from video_depth_anything.dinov2 import DINOv2
    from video_depth_anything.dpt_temporal import DPTHeadTemporal

    cfg = get_config("vitg")
    with torch.no_grad():
        enc = DINOv2(model_name="vitg")
        head = DPTHeadTemporal(enc.embed_dim, cfg.features,
                               out_channels=list(cfg.out_channels),
                               num_frames=cfg.num_frames, pe=cfg.pe)
    sd = {f"pretrained.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"head.{k}": v for k, v in head.state_dict().items()})
    n_params = sum(v.numel() for v in sd.values())

    params = convert_state_dict(sd, cfg, strict=True)

    import jax

    n_leaves = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    n_pe = sum(int(np.prod(v.shape)) for k, v in sd.items()
               if "pos_encoder.pe" in k)
    assert n_leaves == n_params - n_pe

    blk = params["pretrained"]["blocks"][0]
    d = cfg.vit.embed_dim                      # 1536
    hidden = (int(int(d * 4.0) * 2 / 3) + 7) // 8 * 8   # 2736 (xformers rule)
    assert blk["mlp"]["w12"]["w"].shape == (d, 2 * hidden)
    assert blk["mlp"]["w3"]["w"].shape == (hidden, d)
    assert params["head"]["projects"][0]["w"].shape == (1, 1, d, 1536)
