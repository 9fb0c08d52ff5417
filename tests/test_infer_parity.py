"""End-to-end inference parity vs the reference pipeline.

Builds a tiny 4-block reference VideoDepthAnything (object constructed without
the fixed-size factory), converts its weights, and compares:

  * the full windowed driver (preprocess -> windows -> keyframe overlap ->
    stitching) against reference infer_video_depth (video_depth.py:70-162)
  * the causal streaming driver against reference infer_video_depth_one
    (video_depth_stream.py:77-161), including cache eviction

This is the integration-level fidelity gate: identical frames in, near-equal
depths out.
"""

import numpy as np
import pytest

from tests.conftest import requires_torch
from vda_tpu.config import EncoderConfig, ModelConfig
from vda_tpu.utils.convert import convert_state_dict

pytestmark = requires_torch

VIT4 = EncoderConfig(embed_dim=64, depth=4, num_heads=2, img_size=56)
CFG4 = ModelConfig("tiny4", 32, (32, 32, 32, 32), (0, 1, 2, 3), VIT4,
                   num_frames=32)


def _build_ref_modules():
    import torch
    from functools import partial

    from tests.torch_ref import import_reference
    import_reference()
    from video_depth_anything.dinov2 import DinoVisionTransformer
    from video_depth_anything.dinov2_layers import MemEffAttention
    from video_depth_anything.dinov2_layers import NestedTensorBlock as Block
    from video_depth_anything.dpt_temporal import DPTHeadTemporal

    torch.manual_seed(7)
    pretrained = DinoVisionTransformer(
        img_size=56, patch_size=14, embed_dim=64, depth=4, num_heads=2,
        mlp_ratio=4, init_values=1.0, block_chunks=0, num_register_tokens=0,
        interpolate_antialias=False, interpolate_offset=0.1,
        block_fn=partial(Block, attn_class=MemEffAttention))
    head = DPTHeadTemporal(64, features=32, use_bn=False,
                           out_channels=[32, 32, 32, 32], use_clstoken=False,
                           num_frames=32, pe="ape")
    with torch.no_grad():
        for p in list(pretrained.parameters()) + list(head.parameters()):
            p.add_(0.02 * torch.randn_like(p))
        # give the depth head a positive output bias so ReLU doesn't zero
        # everything under random init
        head.scratch.output_conv2[2].bias.add_(0.5)
    return pretrained, head


def _ref_windowed_model(pretrained, head):
    from video_depth_anything.video_depth import VideoDepthAnything
    m = VideoDepthAnything.__new__(VideoDepthAnything)
    import torch.nn as nn
    nn.Module.__init__(m)
    m.intermediate_layer_idx = {"tiny4": [0, 1, 2, 3]}
    m.encoder = "tiny4"
    m.pretrained = pretrained
    m.head = head
    m.metric = False
    return m.eval()


def _ref_streaming_model(pretrained, head):
    from video_depth_anything.video_depth_stream import VideoDepthAnything
    m = VideoDepthAnything.__new__(VideoDepthAnything)
    import torch.nn as nn
    nn.Module.__init__(m)
    m.intermediate_layer_idx = {"tiny4": [0, 1, 2, 3]}
    m.encoder = "tiny4"
    m.pretrained = pretrained
    m.head = head
    m.transform = None
    m.frame_id_list = []
    m.frame_cache_list = []
    m.gap = 41
    m.id = -1
    return m.eval()


@pytest.fixture(scope="module")
def models():
    pretrained, head = _build_ref_modules()
    sd = {}
    import torch
    with torch.no_grad():
        for k, v in pretrained.state_dict().items():
            sd[f"pretrained.{k}"] = v
        for k, v in head.state_dict().items():
            sd[f"head.{k}"] = v
    params = convert_state_dict(sd, CFG4)
    return pretrained, head, params


def _frames(n=40, h=70, w=90, seed=11):
    rng = np.random.default_rng(seed)
    # smooth-ish frames: random low-res upsampled, more realistic than noise
    small = rng.random((n, 7, 9, 3))
    import cv2
    return np.stack([
        (cv2.resize(s, (w, h), interpolation=cv2.INTER_CUBIC).clip(0, 1)
         * 255).astype(np.uint8)
        for s in small
    ])


def test_windowed_infer_matches_reference(models):
    pretrained, head, params = models
    ref_model = _ref_windowed_model(pretrained, head)
    frames = _frames()

    ref_depths, _ = ref_model.infer_video_depth(
        frames, 24, input_size=56, device="cpu", fp32=True)

    from vda_tpu.infer import infer_video_depth
    our_depths, _ = infer_video_depth(params, frames, 24, CFG4,
                                      input_size=56, fp32=True)

    assert our_depths.shape == ref_depths.shape
    scale = max(float(np.abs(ref_depths).max()), 1e-6)
    err = np.abs(our_depths - ref_depths).max() / scale
    assert err < 5e-3, f"windowed parity rel err {err}"


def test_streaming_infer_matches_reference(models):
    pretrained, head, params = models
    ref_model = _ref_streaming_model(pretrained, head)
    frames = _frames(n=14)

    import torch
    ref_out = []
    with torch.no_grad():
        for i in range(len(frames)):
            ref_out.append(ref_model.infer_video_depth_one(
                frames[i], input_size=56, device="cpu", fp32=True))

    from vda_tpu.infer import StreamingDepth
    stream = StreamingDepth(params, CFG4, input_size=56, fp32=True)
    our_out = [stream(frames[i]) for i in range(len(frames))]

    scale = max(float(np.abs(np.stack(ref_out)).max()), 1e-6)
    for i, (r, o) in enumerate(zip(ref_out, our_out)):
        err = np.abs(o - r).max() / scale
        assert err < 5e-3, f"frame {i}: streaming parity rel err {err}"
