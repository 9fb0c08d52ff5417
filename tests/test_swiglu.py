"""SwiGLU-fused FFN (vitg encoder family) parity vs the torch reference."""

import numpy as np
import pytest

from tests.conftest import requires_torch
from vda_tpu.config import EncoderConfig
from vda_tpu.utils.convert import convert_state_dict, _Reader, _convert_encoder

pytestmark = requires_torch

VITG_TINY = EncoderConfig(embed_dim=48, depth=2, num_heads=2, img_size=56,
                          ffn_layer="swiglufused")


def test_swiglu_encoder_parity():
    import torch
    from functools import partial

    from tests.torch_ref import import_reference
    import_reference()
    from video_depth_anything.dinov2 import DinoVisionTransformer
    from video_depth_anything.dinov2_layers import MemEffAttention
    from video_depth_anything.dinov2_layers import NestedTensorBlock as Block

    torch.manual_seed(4)
    ref = DinoVisionTransformer(
        img_size=56, patch_size=14, embed_dim=48, depth=2, num_heads=2,
        mlp_ratio=4, init_values=1.0, block_chunks=0, num_register_tokens=0,
        interpolate_offset=0.1, ffn_layer="swiglufused",
        block_fn=partial(Block, attn_class=MemEffAttention)).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.02 * torch.randn_like(p))

    # hidden dim rule check (reference swiglu_ffn.py:57):
    assert ref.blocks[0].mlp.w12.weight.shape[0] == 2 * ((int(48 * 4 * 2 / 3)
                                                          + 7) // 8 * 8)

    sd = {f"pretrained.{k}": v for k, v in ref.state_dict().items()}
    r = _Reader({k: v.detach().numpy() for k, v in sd.items()})

    class FakeCfg:
        vit = VITG_TINY

    params = _convert_encoder(r, FakeCfg)
    assert not r.leftover()

    import jax.numpy as jnp
    from vda_tpu.models.dinov2 import encode

    x = np.random.default_rng(6).standard_normal(
        (2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.get_intermediate_layers(torch.from_numpy(x), [0, 1],
                                              return_class_token=True)
    ours = encode({"pretrained": params}["pretrained"],
                  jnp.asarray(x.transpose(0, 2, 3, 1)), VITG_TINY, (0, 1),
                  attn_impl="xla")
    for (rt, rc), (ot, oc) in zip(ref_out, ours):
        np.testing.assert_allclose(np.asarray(ot), rt.detach().numpy(),
                                   rtol=1e-3, atol=1e-4)
