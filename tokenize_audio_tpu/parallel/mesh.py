"""Device mesh and sharding helpers.

The reference's parallelism is pure shard-level data parallelism over Slurm
jobs (SURVEY §2.2); within one host the TPU-native equivalent is a
``jax.sharding.Mesh`` with the encode batch sharded over the ``data`` axis
and model params replicated. A ``model`` axis is kept in the mesh for
tensor-parallel experiments on the transformer bottleneck, but Mimi is
~80 M params, so dp-only is the production layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    dp: Optional[int] = None,
    tp: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the given devices.

    dp defaults to len(devices) // tp. On a single chip this degenerates to
    a 1x1 mesh, so all engine code paths are mesh-agnostic.
    """
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // tp
    if dp < 1 or dp * tp > len(devices):
        raise ValueError(
            f"mesh {dp}x{tp} needs {max(dp, 1) * tp} devices, found "
            f"{len(devices)} — an empty/overshooting grid would otherwise "
            "surface as an obscure sharding error far from here"
        )
    if dp * tp != len(devices):
        devices = devices[: dp * tp]
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dimension over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate_params(params, mesh: Mesh):
    """Replicate a param pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def shard_params_tp(params, mesh: Mesh):
    """Megatron-style tensor-parallel placement of the transformer bottleneck
    over the ``model`` axis; everything else replicated.

    q/k/v and fc1 are column-parallel (output features sharded), o and fc2
    row-parallel (input features sharded); XLA inserts the psum at the
    row-parallel matmuls during jit sharding propagation.
    """
    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P("model", None))
    row = NamedSharding(mesh, P(None, "model"))

    # replicate everything EXCEPT the transformer, which gets its TP
    # placement below — device_putting it replicated first would ship the
    # bottleneck weights over the wire twice and discard the first copies
    out = {
        k: jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), v)
        for k, v in params.items()
        if k != "tfm"
    }
    tp_layers = []
    for lp in params["tfm"]:
        lp = dict(lp)
        for k in ("q", "k", "v", "fc1"):
            lp[k] = jax.device_put(lp[k], col)
        for k in ("o", "fc2"):
            lp[k] = jax.device_put(lp[k], row)
        for k in ("ln1_w", "ln1_b", "ln2_w", "ln2_b", "ls1", "ls2"):
            lp[k] = jax.device_put(lp[k], rep)
        tp_layers.append(lp)
    out["tfm"] = tp_layers
    return out
