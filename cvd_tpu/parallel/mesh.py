"""Device-mesh utilities: data-parallel sharding over ICI.

The reference's only parallelism is NCCL DDP (train_epi_control.py:41-69,349)
plus N independent inference processes. TPU-native equivalent:

* training: a 1-D ``data`` mesh; params/opt-state replicated, batch sharded
  on axis 0; jit inserts the gradient psum automatically from shardings.
* inference: the (views x CFG) batch axis of the UNet call is embarrassingly
  shardable over the same mesh — a capability the reference lacks.

Larger meshes (tp/sp axes) slot in here later; every entry point takes the
mesh as an argument so topology is a runtime choice, not a code path.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    axis_shapes: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; defaults to all local devices on one 'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_shapes is None:
        axis_shapes = (len(devices),)
    assert int(np.prod(axis_shapes)) == len(devices), (
        f"mesh {axis_shapes} != {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(axis_shapes)
    return Mesh(dev_array, axis_names)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_params(params, mesh: Mesh):
    """Params replicated (pure data parallelism)."""
    return replicate(params, mesh)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading dim over the data axis."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def inference_mesh(
    n_devices: Optional[int] = None,
    rows: int = 4,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """("rows", "frames") mesh for sharded sampling.

    The UNet batch rows (views x CFG — 4 in the simple pipeline, 2V in the
    advanced one) shard over "rows"; the video frame axis shards over
    "frames". Both are batch-like through every per-frame op; only the
    motion module's temporal attention communicates across "frames" (XLA
    inserts the collectives). The reference has no multi-device inference
    at all (SURVEY.md §2.5).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    rows = math.gcd(rows, n)
    return create_mesh((rows, n // rows), ("rows", "frames"), devices=devices[:n])


def constrain(x, mesh: Optional[Mesh], *axis_names: Optional[str]):
    """with_sharding_constraint mapping leading dims to named mesh axes
    (None = replicated dim). No-op without a mesh."""
    if mesh is None:
        return x
    spec = P(*axis_names, *([None] * (x.ndim - len(axis_names))))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
