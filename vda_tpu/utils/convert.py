"""Checkpoint conversion: reference torch ``.pth`` state dicts -> params pytree.

The reference ships flat torch state dicts (reference run.py:50-54, key roots
``pretrained.*`` for the DINOv2 encoder and ``head.*`` for the temporal DPT
head).  This module maps every key to our pytree with the required layout
changes:

  * linear weights transpose (out,in) -> (in,out)
  * conv weights OIHW -> HWIO
  * conv-transpose weights (Cin,Cout,kH,kW) -> (Cin,kH,kW,Cout)
  * cls/mask tokens squeeze to (D,)
  * the ``pos_encoder.pe`` sinusoidal buffer is dropped (recomputed on the fly)

Conversion is strict: every checkpoint key must be consumed and every expected
pytree leaf must be produced, so naming drift fails loudly.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from vda_tpu.config import ModelConfig


def _t(a):  # linear weight
    return np.ascontiguousarray(np.asarray(a).T)


def _conv(a):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(np.asarray(a), (2, 3, 1, 0)))


def _deconv(a):  # (Cin, Cout, kH, kW) -> (Cin, kH, kW, Cout)
    return np.ascontiguousarray(np.transpose(np.asarray(a), (0, 2, 3, 1)))


def _arr(a):
    return np.ascontiguousarray(np.asarray(a))


class _Reader:
    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = dict(sd)
        self.used = set()

    def __call__(self, key: str, fn=_arr):
        if key not in self.sd:
            raise KeyError(f"checkpoint missing key: {key}")
        self.used.add(key)
        return fn(self.sd[key])

    def has(self, key: str) -> bool:
        return key in self.sd

    def leftover(self):
        return [k for k in self.sd if k not in self.used]


def _convert_linear(r, prefix, bias=True):
    p = {"w": r(f"{prefix}.weight", _t)}
    if bias and r.has(f"{prefix}.bias"):
        p["b"] = r(f"{prefix}.bias")
    return p


def _convert_conv(r, prefix, bias=True):
    p = {"w": r(f"{prefix}.weight", _conv)}
    if bias and r.has(f"{prefix}.bias"):
        p["b"] = r(f"{prefix}.bias")
    return p


def _convert_ln(r, prefix):
    return {"scale": r(f"{prefix}.weight"), "bias": r(f"{prefix}.bias")}


def _convert_block(r, prefix, ffn_layer):
    p = {
        "norm1": _convert_ln(r, f"{prefix}.norm1"),
        "attn": {
            "qkv": _convert_linear(r, f"{prefix}.attn.qkv"),
            "proj": _convert_linear(r, f"{prefix}.attn.proj"),
        },
        "ls1": r(f"{prefix}.ls1.gamma"),
        "norm2": _convert_ln(r, f"{prefix}.norm2"),
        "ls2": r(f"{prefix}.ls2.gamma"),
    }
    if ffn_layer == "swiglufused":
        p["mlp"] = {
            "w12": _convert_linear(r, f"{prefix}.mlp.w12"),
            "w3": _convert_linear(r, f"{prefix}.mlp.w3"),
        }
    else:
        p["mlp"] = {
            "fc1": _convert_linear(r, f"{prefix}.mlp.fc1"),
            "fc2": _convert_linear(r, f"{prefix}.mlp.fc2"),
        }
    return p


def _convert_encoder(r, cfg: ModelConfig):
    vit = cfg.vit
    return {
        "cls_token": r("pretrained.cls_token").reshape(-1),
        "pos_embed": r("pretrained.pos_embed"),
        "mask_token": r("pretrained.mask_token").reshape(-1),
        "patch_embed": _convert_conv(r, "pretrained.patch_embed.proj"),
        "blocks": [
            _convert_block(r, f"pretrained.blocks.{i}", vit.ffn_layer)
            for i in range(vit.depth)
        ],
        "norm": _convert_ln(r, "pretrained.norm"),
    }


def _convert_rcu(r, prefix):
    return {
        "conv1": _convert_conv(r, f"{prefix}.conv1"),
        "conv2": _convert_conv(r, f"{prefix}.conv2"),
    }


def _convert_fusion(r, prefix):
    return {
        "rcu1": _convert_rcu(r, f"{prefix}.resConfUnit1"),
        "rcu2": _convert_rcu(r, f"{prefix}.resConfUnit2"),
        "out_conv": _convert_conv(r, f"{prefix}.out_conv"),
    }


def _convert_motion_module(r, prefix, cfg: ModelConfig):
    tt = f"{prefix}.temporal_transformer"
    blocks = []
    for b in range(cfg.num_transformer_block):
        bp = f"{tt}.transformer_blocks.{b}"
        attn, norms = [], []
        for a in range(cfg.num_attention_blocks):
            ap = f"{bp}.attention_blocks.{a}"
            # pos_encoder.pe is a deterministic sinusoidal buffer
            # (reference motion_module.py:201-206) — recomputed, not loaded.
            if r.has(f"{ap}.pos_encoder.pe"):
                r(f"{ap}.pos_encoder.pe")
            attn.append({
                "to_q": _convert_linear(r, f"{ap}.to_q"),
                "to_k": _convert_linear(r, f"{ap}.to_k"),
                "to_v": _convert_linear(r, f"{ap}.to_v"),
                "to_out": _convert_linear(r, f"{ap}.to_out.0"),
            })
            norms.append(_convert_ln(r, f"{bp}.norms.{a}"))
        blocks.append({
            "attn": attn,
            "norms": norms,
            "ff": {
                "proj": _convert_linear(r, f"{bp}.ff.net.0.proj"),
                "out": _convert_linear(r, f"{bp}.ff.net.2"),
            },
            "ff_norm": _convert_ln(r, f"{bp}.ff_norm"),
        })
    return {
        "norm": _convert_ln(r, f"{tt}.norm"),
        "proj_in": _convert_linear(r, f"{tt}.proj_in"),
        "blocks": blocks,
        "proj_out": _convert_linear(r, f"{tt}.proj_out"),
    }


def _convert_head(r, cfg: ModelConfig):
    p = {
        "projects": [_convert_conv(r, f"head.projects.{i}") for i in range(4)],
        "resize0": {
            "w": r("head.resize_layers.0.weight", _deconv),
            "b": r("head.resize_layers.0.bias"),
        },
        "resize1": {
            "w": r("head.resize_layers.1.weight", _deconv),
            "b": r("head.resize_layers.1.bias"),
        },
        "resize3": _convert_conv(r, "head.resize_layers.3"),
        "scratch": {
            f"layer{i}_rn": _convert_conv(r, f"head.scratch.layer{i}_rn")
            for i in range(1, 5)
        },
        "output_conv1": _convert_conv(r, "head.scratch.output_conv1"),
        "output_conv2": {
            "conv0": _convert_conv(r, "head.scratch.output_conv2.0"),
            "conv1": _convert_conv(r, "head.scratch.output_conv2.2"),
        },
    }
    for j in range(1, 5):
        p[f"refinenet{j}"] = _convert_fusion(r, f"head.scratch.refinenet{j}")
    p["motion_modules"] = [
        _convert_motion_module(r, f"head.motion_modules.{i}", cfg)
        for i in range(4)
    ]
    return p


def convert_state_dict(state_dict: Dict[str, "np.ndarray"], cfg: ModelConfig,
                       strict: bool = True):
    """Convert a reference-format state dict (name -> array) to a params pytree.

    Accepts numpy arrays or anything with ``.numpy()`` (torch tensors).
    """
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v, dtype=np.float32)
    r = _Reader(sd)
    params = {
        "pretrained": _convert_encoder(r, cfg),
        "head": _convert_head(r, cfg),
    }
    if strict:
        left = r.leftover()
        if left:
            raise ValueError(f"unconsumed checkpoint keys: {left[:10]}"
                             f" (+{max(0, len(left) - 10)} more)")
    return params


def load_torch_checkpoint(path: str, cfg: ModelConfig):
    """Load a reference ``.pth`` checkpoint into a params pytree
    (reference run.py:50-54)."""
    import torch  # host-side only; never used in the compute path

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_state_dict(sd, cfg)


def _it(a):  # linear weight inverse: (in, out) -> (out, in)
    return np.ascontiguousarray(np.asarray(a, np.float32).T)


def _iconv(a):  # HWIO -> OIHW
    return np.ascontiguousarray(
        np.transpose(np.asarray(a, np.float32), (3, 2, 0, 1)))


def _ideconv(a):  # (Cin, kH, kW, Cout) -> (Cin, Cout, kH, kW)
    return np.ascontiguousarray(
        np.transpose(np.asarray(a, np.float32), (0, 3, 1, 2)))


def _iarr(a):
    return np.ascontiguousarray(np.asarray(a, np.float32))


def _export_linear(out, p, prefix):
    out[f"{prefix}.weight"] = _it(p["w"])
    if "b" in p:
        out[f"{prefix}.bias"] = _iarr(p["b"])


def _export_conv(out, p, prefix):
    out[f"{prefix}.weight"] = _iconv(p["w"])
    if "b" in p:
        out[f"{prefix}.bias"] = _iarr(p["b"])


def _export_ln(out, p, prefix):
    out[f"{prefix}.weight"] = _iarr(p["scale"])
    out[f"{prefix}.bias"] = _iarr(p["bias"])


def _reference_pe(max_len: int, d_model: int) -> np.ndarray:
    """The reference's persistent ``pos_encoder.pe`` buffer
    (motion_module.py:192-206), (1, max_len, d_model) fp32.

    Computed through torch when available so exported checkpoints are
    BIT-identical to reference-built ones (torch's fp32 exp/sin differ from
    numpy's in the last ulp); the numpy fallback matches to ~1.6e-6, far
    below the buffer's effect on any output (the reference overwrites it at
    load anyway — it is deterministic)."""
    try:
        import math

        import torch

        position = torch.arange(max_len).unsqueeze(1)
        div_term = torch.exp(torch.arange(0, d_model, 2)
                             * (-math.log(10000.0) / d_model))
        pe = torch.zeros(1, max_len, d_model)
        pe[0, :, 0::2] = torch.sin(position * div_term)
        pe[0, :, 1::2] = torch.cos(position * div_term)
        return pe.numpy()
    except ImportError:
        from vda_tpu.models.temporal import _sinusoidal_pe

        return _sinusoidal_pe(max_len, d_model)[None].astype(np.float32)


def export_state_dict(params, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse of ``convert_state_dict``: params pytree -> reference-format
    flat state dict (torch key names + torch layouts, fp32 numpy arrays).

    Lets a model fine-tuned here be loaded by the reference's
    ``load_state_dict(strict=True)`` (reference run.py:50-54) — including the
    deterministic ``pos_encoder.pe`` buffers the reference registers for APE
    motion modules (motion_module.py:192-206).  TP-layout params
    (parallel/mesh.to_tp_layout) are converted back automatically.

    Round-trip ``convert_state_dict(export_state_dict(p)) == p`` is exact
    (pure transposes); tested in tests/test_convert.py.
    """
    if params["pretrained"]["blocks"][0]["attn"]["qkv"]["w"].ndim == 3:
        from vda_tpu.parallel.mesh import from_tp_layout
        params = from_tp_layout(params)

    out: Dict[str, np.ndarray] = {}
    enc = params["pretrained"]
    vit = cfg.vit
    out["pretrained.cls_token"] = _iarr(enc["cls_token"]).reshape(1, 1, -1)
    out["pretrained.mask_token"] = _iarr(enc["mask_token"]).reshape(1, -1)
    out["pretrained.pos_embed"] = _iarr(enc["pos_embed"])
    _export_conv(out, enc["patch_embed"], "pretrained.patch_embed.proj")
    for i, bp in enumerate(enc["blocks"]):
        pre = f"pretrained.blocks.{i}"
        _export_ln(out, bp["norm1"], f"{pre}.norm1")
        _export_linear(out, bp["attn"]["qkv"], f"{pre}.attn.qkv")
        _export_linear(out, bp["attn"]["proj"], f"{pre}.attn.proj")
        out[f"{pre}.ls1.gamma"] = _iarr(bp["ls1"])
        _export_ln(out, bp["norm2"], f"{pre}.norm2")
        out[f"{pre}.ls2.gamma"] = _iarr(bp["ls2"])
        if vit.ffn_layer == "swiglufused":
            _export_linear(out, bp["mlp"]["w12"], f"{pre}.mlp.w12")
            _export_linear(out, bp["mlp"]["w3"], f"{pre}.mlp.w3")
        else:
            _export_linear(out, bp["mlp"]["fc1"], f"{pre}.mlp.fc1")
            _export_linear(out, bp["mlp"]["fc2"], f"{pre}.mlp.fc2")
    _export_ln(out, enc["norm"], "pretrained.norm")

    head = params["head"]
    for i in range(4):
        _export_conv(out, head["projects"][i], f"head.projects.{i}")
    out["head.resize_layers.0.weight"] = _ideconv(head["resize0"]["w"])
    out["head.resize_layers.0.bias"] = _iarr(head["resize0"]["b"])
    out["head.resize_layers.1.weight"] = _ideconv(head["resize1"]["w"])
    out["head.resize_layers.1.bias"] = _iarr(head["resize1"]["b"])
    _export_conv(out, head["resize3"], "head.resize_layers.3")
    for i in range(1, 5):
        _export_conv(out, head["scratch"][f"layer{i}_rn"],
                     f"head.scratch.layer{i}_rn")
    for j in range(1, 5):
        fp = head[f"refinenet{j}"]
        pre = f"head.scratch.refinenet{j}"
        for rcu, rp in (("rcu1", "resConfUnit1"), ("rcu2", "resConfUnit2")):
            _export_conv(out, fp[rcu]["conv1"], f"{pre}.{rp}.conv1")
            _export_conv(out, fp[rcu]["conv2"], f"{pre}.{rp}.conv2")
        _export_conv(out, fp["out_conv"], f"{pre}.out_conv")
    _export_conv(out, head["output_conv1"], "head.scratch.output_conv1")
    _export_conv(out, head["output_conv2"]["conv0"],
                 "head.scratch.output_conv2.0")
    _export_conv(out, head["output_conv2"]["conv1"],
                 "head.scratch.output_conv2.2")

    for i, mm in enumerate(head["motion_modules"]):
        tt = f"head.motion_modules.{i}.temporal_transformer"
        _export_ln(out, mm["norm"], f"{tt}.norm")
        _export_linear(out, mm["proj_in"], f"{tt}.proj_in")
        for b, bp in enumerate(mm["blocks"]):
            bpre = f"{tt}.transformer_blocks.{b}"
            for a, ap in enumerate(bp["attn"]):
                apre = f"{bpre}.attention_blocks.{a}"
                _export_linear(out, ap["to_q"], f"{apre}.to_q")
                _export_linear(out, ap["to_k"], f"{apre}.to_k")
                _export_linear(out, ap["to_v"], f"{apre}.to_v")
                _export_linear(out, ap["to_out"], f"{apre}.to_out.0")
                if cfg.pe == "ape":
                    # deterministic buffer the reference registers
                    # persistently (motion_module.py:201-206; max_len =
                    # num_frames via dpt_temporal.py:38)
                    c = np.asarray(ap["to_q"]["w"]).shape[0]
                    out[f"{apre}.pos_encoder.pe"] = _reference_pe(
                        cfg.num_frames, c)
                _export_ln(out, bp["norms"][a], f"{bpre}.norms.{a}")
            _export_linear(out, bp["ff"]["proj"], f"{bpre}.ff.net.0.proj")
            _export_linear(out, bp["ff"]["out"], f"{bpre}.ff.net.2")
            _export_ln(out, bp["ff_norm"], f"{bpre}.ff_norm")
        _export_linear(out, mm["proj_out"], f"{tt}.proj_out")
    return out


def save_torch_checkpoint(path: str, params, cfg: ModelConfig):
    """Write a reference-loadable ``.pth`` (torch.save of the flat fp32
    state dict from ``export_state_dict``)."""
    import torch  # host-side only; never used in the compute path

    sd = {k: torch.from_numpy(v) for k, v in
          export_state_dict(params, cfg).items()}
    torch.save(sd, path)


def cast_params_for_inference(params, dtype="bfloat16"):
    """Cast weights to the compute dtype once, halving HBM weight traffic.

    The fp32 output-conv island (reference dpt_temporal.py:105-108) keeps its
    weights in fp32; everything else is stored in `dtype`.

    (An int8 encoder-weight option lived here through round 2; it was demoted
    — the Pallas int8 matmul is ~1.8x standalone but only ~0.9% end-to-end at
    vitl, with accuracy unvalidatable offline.  The kernel remains in
    ops/quant.py with scripts/bench_int8_pallas.py as the measured result.)
    """
    import jax
    import jax.numpy as jnp

    target = jnp.dtype(dtype)

    def cast(kp, leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)
        if "output_conv2" in path:
            return leaf
        # only matrices/conv kernels carry meaningful HBM traffic; norm
        # scales, biases, and LayerScale gammas stay fp32 (the reference's
        # autocast also keeps norms in fp32)
        if getattr(leaf, "ndim", 0) < 2:
            return leaf
        return leaf.astype(target) if hasattr(leaf, "astype") else leaf

    return jax.tree_util.tree_map_with_path(cast, params)


def save_params_npz(path: str, params):
    """Flat .npz serialization of a params pytree (native format)."""
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for kp, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        out[name] = np.asarray(leaf)
    np.savez(path, **out)


def load_params_npz(path: str, like_params):
    """Load a flat .npz produced by save_params_npz into the given structure."""
    import jax

    data = np.load(path)
    flat, tree = jax.tree_util.tree_flatten_with_path(like_params)
    leaves = []
    for kp, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        leaves.append(data[name])
    return jax.tree_util.tree_unflatten(tree, leaves)
