"""Device mesh + sharding rules.

The reference is strictly single-device (SURVEY.md §2.5: no torch.distributed
anywhere); scale-out here is new, TPU-native design:

  * mesh axes ('data', 'model'): data-parallel over videos/windows (ICI),
    tensor-parallel over attention heads + MLP hidden dims (Megatron-style,
    collectives inserted by GSPMD from sharding annotations)
  * inference fan-out: shard the window/batch dim over 'data'
  * training: batch over 'data', encoder + temporal-module matmuls over
    'model', optional Megatron sequence parallelism (token-sharded norm
    regions, EncoderConfig.seq_shard / trainer sp=True)

Rules are expressed as jax.sharding.PartitionSpec per parameter path; GSPMD
inserts the all-reduces (qkv column-parallel -> proj row-parallel -> psum,
fc1 column -> fc2 row -> psum) so the per-layer comm pattern matches the
standard 2-collective transformer TP recipe.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh.  tp = model-parallel degree."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    grid = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def to_tp_layout(params):
    """Reshape the fused encoder qkv weights for HEAD-ALIGNED tensor
    parallelism: (d, 3d) [q|k|v] -> (d, 3, d) and bias (3d,) -> (3, d).

    Sharding the fused (d, 3d) columns directly is head-MISALIGNED — a tp=2
    shard holds all of q plus half of k, so GSPMD must reshard around the
    per-head attention.  With the 3-axis layout the MODEL axis splits the
    last dim (whole heads of q, k, AND v per shard): the Megatron recipe
    with exactly one all-reduce after the out-projection.  The model applies
    3D qkv weights natively (models/dinov2._attention).  Inverse:
    ``from_tp_layout`` (use before exporting checkpoints)."""

    def conv(params):
        for bp in params["pretrained"]["blocks"]:
            qkv = bp["attn"]["qkv"]
            if qkv["w"].ndim == 2:
                d = qkv["w"].shape[0]
                qkv["w"] = qkv["w"].reshape(d, 3, d)
                qkv["b"] = qkv["b"].reshape(3, d)
        return params

    return conv(jax.tree_util.tree_map(lambda x: x, params))


def from_tp_layout(params):
    """Inverse of ``to_tp_layout``."""
    def conv(params):
        for bp in params["pretrained"]["blocks"]:
            qkv = bp["attn"]["qkv"]
            if qkv["w"].ndim == 3:
                d = qkv["w"].shape[0]
                qkv["w"] = qkv["w"].reshape(d, 3 * d)
                qkv["b"] = qkv["b"].reshape(3 * d)
        return params

    return conv(jax.tree_util.tree_map(lambda x: x, params))


def _spec_for_path(path: str, ndim: int = 2) -> P:
    """Tensor-parallel partition spec for one parameter path."""
    # --- encoder attention: qkv column-parallel (HEAD-ALIGNED 3-axis
    # layout from to_tp_layout), proj row-parallel ---
    if path.endswith("attn/qkv/w"):
        # the raw fused (d, 3d) layout is head-misaligned: shard only the
        # to_tp_layout (d, 3, d) form, replicate otherwise
        return P(None, None, MODEL_AXIS) if ndim == 3 else P()
    if path.endswith("attn/qkv/b"):
        return P(None, MODEL_AXIS) if ndim == 2 else P()
    if path.endswith("attn/proj/w"):
        return P(MODEL_AXIS, None)
    # --- encoder MLP: fc1 column, fc2 row ---
    if path.endswith("mlp/fc1/w") or path.endswith("mlp/w12/w"):
        return P(None, MODEL_AXIS)
    if path.endswith("mlp/fc1/b") or path.endswith("mlp/w12/b"):
        return P(MODEL_AXIS)
    if path.endswith("mlp/fc2/w") or path.endswith("mlp/w3/w"):
        return P(MODEL_AXIS, None)
    # --- temporal attention: to_q/k/v column, to_out row ---
    if path.endswith("to_q/w") or path.endswith("to_k/w") \
            or path.endswith("to_v/w"):
        return P(None, MODEL_AXIS)
    if path.endswith("to_out/w"):
        return P(MODEL_AXIS, None)
    # everything else (convs, norms, pos embeds, temporal FF) replicated
    return P()


def _path_str(kp) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a params pytree under the TP rules above.

    For head-aligned encoder-attention sharding, convert the params with
    ``to_tp_layout`` first (raw fused qkv stays replicated otherwise)."""
    def leaf(kp, x):
        spec = _spec_for_path(_path_str(kp), getattr(x, "ndim", 2))
        # guard: axes must divide the dim; fall back to replication otherwise
        tp = mesh.shape[MODEL_AXIS]
        for dim, name in zip(x.shape, spec):
            if name == MODEL_AXIS and dim % tp != 0:
                return NamedSharding(mesh, P())
        if len(spec) > len(x.shape):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, params)


def data_sharding(mesh: Mesh, ndim: int, batch_dim: int = 0) -> NamedSharding:
    """Shard one array's batch dim over the data axis."""
    spec = [None] * ndim
    spec[batch_dim] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
