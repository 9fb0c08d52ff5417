"""Numerical parity vs the torch reference with converter-mapped weights.

Builds the reference modules (random torch-default init), converts their state
dicts with vda_tpu.utils.convert, and compares activations end to end.  This
is the fidelity harness that stands in for real-checkpoint regression until
checkpoints are available (SURVEY.md §4 implication (a))."""

import numpy as np
import pytest

from tests.conftest import requires_torch
from vda_tpu.config import EncoderConfig, ModelConfig
from vda_tpu.utils.convert import convert_state_dict

pytestmark = requires_torch

TINY_VIT = EncoderConfig(embed_dim=64, depth=2, num_heads=2, img_size=56)
TINY_CFG = ModelConfig("tiny", 32, (32, 32, 32, 32), (0, 1, 0, 1), TINY_VIT,
                       num_frames=4)


@pytest.fixture(scope="module")
def ref():
    from tests.torch_ref import import_reference
    return import_reference()


@pytest.fixture(scope="module")
def ref_model(ref):
    """Reference VideoDepthAnything at tiny scale, eval mode."""
    import torch
    from video_depth_anything.dinov2 import DinoVisionTransformer
    from video_depth_anything.dinov2_layers import MemEffAttention
    from video_depth_anything.dinov2_layers import NestedTensorBlock as Block
    from video_depth_anything.dpt_temporal import DPTHeadTemporal
    from functools import partial

    torch.manual_seed(0)

    class TinyVDA(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.pretrained = DinoVisionTransformer(
                img_size=56, patch_size=14, embed_dim=64, depth=2,
                num_heads=2, mlp_ratio=4, init_values=1.0, block_chunks=0,
                num_register_tokens=0, interpolate_antialias=False,
                interpolate_offset=0.1,
                block_fn=partial(Block, attn_class=MemEffAttention),
            )
            self.head = DPTHeadTemporal(
                64, features=32, use_bn=False,
                out_channels=[32, 32, 32, 32], use_clstoken=False,
                num_frames=4, pe="ape")

    m = TinyVDA().eval()
    # randomize everything away from degenerate defaults (pos_embed etc. are
    # zero-init before DINOv2's init_weights; make sure values are generic)
    with torch.no_grad():
        for p in m.parameters():
            p.add_(0.02 * torch.randn_like(p))
    return m


@pytest.fixture(scope="module")
def jax_params(ref_model):
    return convert_state_dict(ref_model.state_dict(), TINY_CFG)


def _to_np(t):
    return t.detach().cpu().numpy()


class TestEncoderParity:
    def test_get_intermediate_layers(self, ref_model, jax_params):
        import torch
        import jax.numpy as jnp
        from vda_tpu.models.dinov2 import encode

        x = np.random.default_rng(1).standard_normal(
            (3, 3, 56, 56)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref_model.pretrained.get_intermediate_layers(
                torch.from_numpy(x), [0, 1], return_class_token=True)
        ours = encode(jax_params["pretrained"],
                      jnp.asarray(x.transpose(0, 2, 3, 1)), TINY_VIT,
                      (0, 1), attn_impl="xla")
        for (ref_tok, ref_cls), (our_tok, our_cls) in zip(ref_out, ours):
            np.testing.assert_allclose(np.asarray(our_tok), _to_np(ref_tok),
                                       rtol=1e-3, atol=1e-4)
            np.testing.assert_allclose(np.asarray(our_cls), _to_np(ref_cls),
                                       rtol=1e-3, atol=1e-4)

    def test_masked_tokens(self, ref_model, jax_params):
        """iBOT-style input masking: masked patch embeddings are replaced by
        the learned mask_token before the position embedding is added
        (reference dinov2.py prepare_tokens_with_masks).  Training-only."""
        import torch
        import jax.numpy as jnp
        from vda_tpu.models.dinov2 import encode, prepare_tokens

        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
        n_patches = (56 // 14) ** 2
        masks = rng.random((2, n_patches)) < 0.4
        with torch.no_grad():
            ref_prep = ref_model.pretrained.prepare_tokens_with_masks(
                torch.from_numpy(x), torch.from_numpy(masks))
            h = ref_prep
            for blk in ref_model.pretrained.blocks:
                h = blk(h)
            ref_feat = ref_model.pretrained.norm(h)
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))
        mj = jnp.asarray(masks)
        our_prep = prepare_tokens(jax_params["pretrained"], xj, TINY_VIT,
                                  masks=mj)
        np.testing.assert_allclose(np.asarray(our_prep), _to_np(ref_prep),
                                   rtol=1e-3, atol=1e-4)
        ours = encode(jax_params["pretrained"], xj, TINY_VIT, (1,),
                      attn_impl="xla", masks=mj)
        ref_tok, ref_cls = ref_feat[:, 1:], ref_feat[:, 0]
        np.testing.assert_allclose(np.asarray(ours[0][0]), _to_np(ref_tok),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours[0][1]), _to_np(ref_cls),
                                   rtol=1e-3, atol=1e-4)

    def test_pos_embed_interpolation_path(self, ref_model, jax_params):
        """Non-native input size exercises bicubic pos-embed interpolation
        (reference dinov2.py:179-210)."""
        import torch
        import jax.numpy as jnp
        from vda_tpu.models.dinov2 import encode

        x = np.random.default_rng(2).standard_normal(
            (1, 3, 70, 84)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref_model.pretrained.get_intermediate_layers(
                torch.from_numpy(x), [1], return_class_token=True)
        ours = encode(jax_params["pretrained"],
                      jnp.asarray(x.transpose(0, 2, 3, 1)), TINY_VIT,
                      (1,), attn_impl="xla")
        np.testing.assert_allclose(np.asarray(ours[0][0]),
                                   _to_np(ref_out[0][0]),
                                   rtol=1e-3, atol=1e-4)


class TestNestedBlockParity:
    def test_variable_sequence_batches(self, ref_model, jax_params):
        """NestedTensorBlock equivalent (reference dinov2_layers/block.py:
        204-252).  With xFormers absent the reference's list path asserts,
        but its math is exactly per-sample plain-block attention
        (BlockDiagonalMask = block-diagonal over samples); compare our packed
        segment path against the reference block run per sample."""
        import torch
        import jax.numpy as jnp
        from vda_tpu.models.dinov2 import block_apply_nested

        rng = np.random.default_rng(5)
        shapes = [(2, 17, 64), (1, 33, 64), (3, 9, 64)]
        xs = [rng.standard_normal(s).astype(np.float32) * 0.5 for s in shapes]
        blk = ref_model.pretrained.blocks[0]
        with torch.no_grad():
            ref_out = [blk(torch.from_numpy(x)) for x in xs]
        x_list = [jnp.asarray(x) for x in xs]
        bp = jax_params["pretrained"]["blocks"][0]
        for impl in ("xla", "pallas"):
            ours = block_apply_nested(bp, x_list, TINY_VIT, attn_impl=impl)
            for o, r in zip(ours, ref_out):
                np.testing.assert_allclose(np.asarray(o), _to_np(r),
                                           rtol=1e-3, atol=1e-4,
                                           err_msg=f"impl={impl}")


class TestHeadParity:
    @pytest.fixture(scope="class")
    def features(self):
        rng = np.random.default_rng(3)
        bt, n, d = 4, 16, 64  # B=1, T=4, 4x4 patch grid
        return [
            (rng.standard_normal((bt, n, d)).astype(np.float32),
             rng.standard_normal((bt, d)).astype(np.float32))
            for _ in range(4)
        ]

    def test_temporal_head_offline(self, ref_model, jax_params, features):
        import torch
        import jax.numpy as jnp
        from vda_tpu.models.dpt import dpt_head_temporal_apply

        ref_feats = [(torch.from_numpy(t), torch.from_numpy(c))
                     for t, c in features]
        with torch.no_grad():
            ref_depth, ref_caches = ref_model.head(ref_feats, 4, 4, 4)
        our_feats = [(jnp.asarray(t), jnp.asarray(c)) for t, c in features]
        our_depth, our_caches = dpt_head_temporal_apply(
            jax_params["head"], our_feats, (4, 4), 4, TINY_CFG)

        np.testing.assert_allclose(
            np.asarray(our_depth)[..., 0],
            _to_np(ref_depth)[:, 0], rtol=1e-3, atol=1e-4)
        assert len(our_caches) == len(ref_caches) == 8
        for oc, rc in zip(our_caches, ref_caches):
            np.testing.assert_allclose(np.asarray(oc), _to_np(rc),
                                       rtol=1e-3, atol=1e-4)

    def test_temporal_head_cached(self, ref_model, jax_params, features):
        """Streaming cache path: 1 new frame vs 3 cached
        (reference dpt_temporal.py:74-93, motion_module.py:249-274)."""
        import torch
        import jax.numpy as jnp
        from vda_tpu.models.dpt import dpt_head_temporal_apply

        ref_feats = [(torch.from_numpy(t), torch.from_numpy(c))
                     for t, c in features]
        with torch.no_grad():
            _, ref_caches = ref_model.head(ref_feats, 4, 4, 4)
            ref_last = [(t[-1:], c[-1:]) for t, c in ref_feats]
            ref_cache_prefix = [h[:, :-1] for h in ref_caches]
            ref_depth1, ref_new = ref_model.head(
                ref_last, 4, 4, 1,
                cached_hidden_state_list=ref_cache_prefix)

        our_feats = [(jnp.asarray(t), jnp.asarray(c)) for t, c in features]
        _, our_caches = dpt_head_temporal_apply(
            jax_params["head"], our_feats, (4, 4), 4, TINY_CFG)
        our_last = [(t[-1:], c[-1:]) for t, c in our_feats]
        our_cache_prefix = [jnp.asarray(h)[:, :-1] for h in our_caches]
        our_depth1, our_new = dpt_head_temporal_apply(
            jax_params["head"], our_last, (4, 4), 1, TINY_CFG,
            cached_hidden_state_list=our_cache_prefix)

        np.testing.assert_allclose(
            np.asarray(our_depth1)[..., 0], _to_np(ref_depth1)[:, 0],
            rtol=1e-3, atol=1e-4)
        for on, rn in zip(our_new, ref_new):
            np.testing.assert_allclose(np.asarray(on), _to_np(rn),
                                       rtol=1e-3, atol=1e-4)


class TestFullModelParity:
    def test_forward(self, ref_model, jax_params):
        import torch
        import torch.nn.functional as F
        import jax.numpy as jnp
        from vda_tpu.models.vda import forward

        x = np.random.default_rng(4).standard_normal(
            (1, 4, 3, 56, 56)).astype(np.float32)

        with torch.no_grad():
            xt = torch.from_numpy(x)
            b, t = 1, 4
            # the reference tap API drops duplicate indices; expand manually
            f01 = ref_model.pretrained.get_intermediate_layers(
                xt.flatten(0, 1), [0, 1], return_class_token=True)
            feats = [f01[0], f01[1], f01[0], f01[1]]
            depth = ref_model.head(feats, 4, 4, t)[0]
            depth = F.interpolate(depth, size=(56, 56), mode="bilinear",
                                  align_corners=True)
            ref_depth = F.relu(depth).squeeze(1).unflatten(0, (b, t)).numpy()

        our = forward(jax_params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                      TINY_CFG, attn_impl="xla")
        np.testing.assert_allclose(np.asarray(our), ref_depth,
                                   rtol=1e-3, atol=1e-4)
