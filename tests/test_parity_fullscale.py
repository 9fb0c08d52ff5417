"""FULL-SCALE end-to-end parity vs the torch reference (random weights).

The tiny-scale harness (tests/test_parity.py) checks every code path; this
file closes the remaining gap named in VERDICT r2 ("full-scale numerics"):
the real `VideoDepthAnything` factory at vits/vitl scale (reference
video_depth.py:35-67), random torch-default weights perturbed away from
degenerate zero-inits, converted with utils/convert, compared end to end in
fp32 on a 2-frame 518x518 clip.

Heavy (vitl is ~3 GB of fp32 weights across both frameworks and ~4 TFLOP of
CPU compute), so gated behind VDA_FULLSCALE_PARITY=1 — run explicitly:

    VDA_FULLSCALE_PARITY=1 python -m pytest tests/test_parity_fullscale.py -v
"""

import os

import numpy as np
import pytest

from tests.conftest import requires_torch
from vda_tpu.config import get_config

pytestmark = [
    requires_torch,
    pytest.mark.skipif(os.environ.get("VDA_FULLSCALE_PARITY") != "1",
                       reason="full-scale parity is heavy; set "
                              "VDA_FULLSCALE_PARITY=1"),
]


def _build_and_compare(encoder: str, t: int = 2, size: int = 518,
                       seed: int = 7, inject_taps: bool = False):
    import torch

    from tests.torch_ref import import_reference
    import_reference()
    from video_depth_anything.video_depth import VideoDepthAnything

    import jax.numpy as jnp

    from vda_tpu.models.vda import forward
    from vda_tpu.utils.convert import convert_state_dict

    cfg = get_config(encoder)
    torch.manual_seed(0)
    m = VideoDepthAnything(
        encoder=encoder, features=cfg.features,
        out_channels=list(cfg.out_channels)).eval()
    if inject_taps:
        # the reference factory ships no vitg entry in intermediate_layer_idx
        # (video_depth.py:49-53); inject our tap schedule so the torch model
        # taps the same layers
        m.intermediate_layer_idx[encoder] = list(cfg.intermediate_layer_idx)
    with torch.no_grad():
        # pos_embed/mask_token/LayerScale start at degenerate constants before
        # DINOv2's init_weights; perturb everything so the comparison is
        # generic (same recipe as the tiny harness)
        for p in m.parameters():
            p.add_(0.02 * torch.randn_like(p))

    x = np.random.default_rng(seed).standard_normal(
        (1, t, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        ref_depth = m(torch.from_numpy(x)).numpy()  # (B, T, H, W), relu'd

    params = convert_state_dict(m.state_dict(), cfg)
    del m
    our = np.asarray(forward(params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                             cfg, attn_impl="xla"))

    assert our.shape == ref_depth.shape
    scale = max(float(np.abs(ref_depth).max()), 1e-6)
    max_abs = float(np.abs(our - ref_depth).max())
    # fp32 end-to-end through 24 blocks + head: reduction-order noise only
    assert max_abs / scale < 1e-3, (max_abs, scale)


def test_fullscale_vits():
    _build_and_compare("vits")


def test_fullscale_vitl():
    _build_and_compare("vitl")


def test_fullscale_vitg_full_model():
    """vitg END-TO-END at full width/depth (VERDICT r3 #7): tap schedule
    (layers 9/19/29/39, the DINOv2 n=4 default for depth 40) injected into
    the reference factory, whole encoder+temporal-head+output stack compared
    in fp32.  Small image (140² -> 10x10 patches) bounds the single-CPU wall
    time; every layer still runs at full 1536-wide vitg scale."""
    _build_and_compare("vitg", size=140, seed=13, inject_taps=True)


def test_fullscale_vitg_encoder():
    """vitg at full width/depth (swiglufused, embed 1536 x 40 blocks —
    reference dinov2.py:381-414): activation parity of the tap outputs.
    The reference ships no vitg head, so this covers the encoder, which is
    where vitg differs (the DA-family giant head constants are plain DPT).
    Small image keeps CPU time bounded; the pos-embed interpolation path is
    exercised as a bonus (518-trained grid -> 10x10 tokens)."""
    import torch

    from tests.torch_ref import import_reference
    import_reference()
    from video_depth_anything.dinov2 import DINOv2

    import jax.numpy as jnp

    from vda_tpu.models.dinov2 import encode
    from vda_tpu.utils.convert import convert_state_dict

    cfg = get_config("vitg")
    torch.manual_seed(0)
    m = DINOv2(model_name="vitg").eval()
    with torch.no_grad():
        for p in m.parameters():
            p.add_(0.02 * torch.randn_like(p))

    size = 140  # 10x10 patches + cls = 101 tokens
    x = np.random.default_rng(11).standard_normal(
        (1, 3, size, size)).astype(np.float32)
    taps = sorted(set(cfg.intermediate_layer_idx))
    with torch.no_grad():
        ref_out = m.get_intermediate_layers(torch.from_numpy(x), taps,
                                            return_class_token=True)

    # the converter maps a full checkpoint; pair the encoder with the
    # DA-family giant head exactly like test_convert_fullscale.py
    from video_depth_anything.dpt_temporal import DPTHeadTemporal

    with torch.no_grad():
        head = DPTHeadTemporal(m.embed_dim, cfg.features,
                               out_channels=list(cfg.out_channels),
                               num_frames=cfg.num_frames, pe=cfg.pe)
    sd = {f"pretrained.{k}": v for k, v in m.state_dict().items()}
    sd.update({f"head.{k}": v for k, v in head.state_dict().items()})
    params = convert_state_dict(sd, cfg)
    del m, head
    ours = encode(params["pretrained"], jnp.asarray(x.transpose(0, 2, 3, 1)),
                  cfg.vit, taps, attn_impl="xla")

    for (ref_p, ref_c), (our_p, our_c) in zip(ref_out, ours):
        for r, o in ((ref_p, our_p), (ref_c, our_c)):
            r = r.numpy()
            scale = max(float(np.abs(r).max()), 1e-6)
            assert float(np.abs(np.asarray(o) - r).max()) / scale < 1e-3
