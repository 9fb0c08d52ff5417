"""Device mesh + sharding rules.

The reference is strictly single-device (SURVEY.md §2.5: no torch.distributed
anywhere); scale-out here is new, TPU-native design:

  * mesh axes ('data', 'model'): data-parallel over videos/windows (ICI),
    tensor-parallel over attention heads + MLP hidden dims (Megatron-style,
    collectives inserted by GSPMD from sharding annotations)
  * inference fan-out: shard the window/batch dim over 'data'
  * training: batch over 'data', encoder + temporal-module matmuls over
    'model'

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


def _spec_for_path(path: str) -> P:
    """Tensor-parallel partition spec for one parameter path."""
    # --- encoder attention: qkv column-parallel, proj row-parallel ---
    if path.endswith("attn/qkv/w"):
        return P(None, MODEL_AXIS)
    if path.endswith("attn/qkv/b"):
        return P(MODEL_AXIS)
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
    """NamedSharding pytree for a params pytree under the TP rules above."""
    def leaf(kp, x):
        spec = _spec_for_path(_path_str(kp))
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
