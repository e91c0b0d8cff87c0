"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's NCCL/DDP stack
(train.py:145, model/RIFE.py:29-30): a 1-D `data` mesh with params
replicated and the batch sharded along `data`.  Gradient all-reduce is
inserted by XLA as psum over ICI — there is no user-visible backend.

RIFE is ~10M params (SURVEY.md §2.7): pure DP is the right parallelism;
the mesh helper still supports extra axes (e.g. ("data", "spatial")) for
the optional halo-exchange spatial sharding of very large frames.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: tuple[str, ...] = ("data",), shape: tuple[int, ...] | None = None,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def superbatch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a K-step staged super-batch (K, batch, ...): the
    scan axis stays whole on every device, the batch axis shards."""
    return NamedSharding(mesh, P(None, axis))


def shard_superbatch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a (K, batch, ...) host super-batch: batch axis (dim 1)
    sharded along `data`, anything non-conforming replicated."""
    sh = superbatch_sharding(mesh, axis)
    rep = replicated_sharding(mesh)
    return {
        k: jax.device_put(
            v, sh if getattr(v, "ndim", 0) >= 2
            and v.shape[1] % mesh.shape[axis] == 0 else rep)
        for k, v in batch.items()
    }


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a host batch (dict of arrays) sharded along the data axis."""
    sh = batch_sharding(mesh, axis)
    rep = replicated_sharding(mesh)
    return {
        k: jax.device_put(v, sh if getattr(v, "ndim", 0) >= 1 and v.shape[0] % mesh.shape[axis] == 0 else rep)
        for k, v in batch.items()
    }
