"""Mesh + sharding helpers.

The reference's only parallelism is single-host ``torch.nn.DataParallel``
(impersonator_trainer.py:192-273; SURVEY §2.3). The TPU-native equivalent:
a ``jax.sharding.Mesh`` with a ``data`` axis; batches shard along it,
parameters replicate, and XLA inserts the gradient all-reduce over ICI
when the jitted loss averages over the sharded batch axis. Multi-host
scale-out is the same program after ``jax.distributed.initialize()``.

Models here are ~100M params total at 256², so data parallelism over
frames is the only sharding that pays; the helpers are nonetheless
written against an arbitrary mesh shape so tensor axes can be annotated
later without restructuring (BASELINE north star).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=(-1,), axes=("data",), devices=None) -> Mesh:
    """Build a device mesh. shape=-1 entries absorb remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    dev_array = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, axes)


def make_data_mesh(batch_size: int, devices=None) -> Mesh:
    """Data mesh using the most devices that evenly divide the batch."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n:
        n -= 1
    return make_mesh((n,), ("data",), devices[:n])


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch/frame) dimension."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a pytree with its leading axis sharded over ``axis``."""
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate_tree(tree, mesh: Mesh):
    sharding = replicate(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
