"""Device mesh construction and batch/param sharding.

The reference's (latent) distribution story is Lightning DDP over NCCL
(`/root/reference/src/tbsim/configs/base.py:44`, never actually configured —
SURVEY.md §2d). The TPU-native equivalent is jit-level SPMD: parameters are
replicated, the batch dimension is sharded over a 1-D 'dp' mesh axis, and
XLA inserts the gradient `psum` over ICI. The same mesh generalizes to
multi-slice (DCN) by extending the axis — no backend code to port.

Models here are ~10M params with large per-sample compute (224x224 rasters),
so pure DP is the right point in the sharding space: no tensor dim is big
enough to pay for TP collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices
    (-1 = all)."""
    devices = jax.devices()
    if num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Place every leaf of a batch pytree with its leading dim sharded over
    the mesh. Leading dims must divide the mesh size.

    Leaves already carrying the target sharding (e.g. global arrays from
    the multi-host loader) pass through untouched — device_put on a
    non-addressable global array would be an error under multi-process."""
    sharding = batch_sharding(mesh, axis_name)

    def place(x):
        if isinstance(x, jax.Array) and x.sharding == sharding:
            return x
        return jax.device_put(x, sharding)

    return jax.tree.map(place, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
