"""Multi-host (multi-process) scale-out.

The reference has no distributed runtime at all — its only parallelism is
single-host DataParallel (impersonator_trainer.py:192-273; SURVEY §2.3).
The TPU-native design is: every process calls
:func:`init_distributed`, builds the SAME global
``jax.sharding.Mesh`` over ``jax.devices()`` (which spans all hosts after
``jax.distributed.initialize``), feeds its process-local batch shard
through :func:`global_shard_batch`, and runs the unchanged pjit train
step — XLA routes the gradient all-reduce over ICI within a slice and
DCN across slices.

Usage (per process)::

    python -m impersonator_tpu.cli.train --coordinator 10.0.0.1:1234 \
        --num_processes 4 --process_id $RANK ...

On Cloud TPU pods all three flags may be omitted — jax autodetects the
topology (cluster_detection_method in jax.distributed.initialize).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize the jax distributed runtime (idempotent).

    Call BEFORE any other jax API touches a backend. With no arguments on
    a single host this is a no-op returning False; on TPU pods with no
    arguments it autodetects. Returns True when a multi-process runtime
    is active (jax.process_count() > 1).
    """
    import jax

    if coordinator or (num_processes or 0) > 1:
        # CPU backends need a cross-process collectives impl; harmless on
        # TPU where ICI/DCN collectives are native.
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_count() > 1


def global_mesh(axes=("data",), shape=(-1,)):
    """Mesh over ALL devices (every process must build the identical
    mesh). shape=-1 absorbs the global device count."""
    import jax
    from impersonator_tpu.parallel.mesh import make_mesh

    return make_mesh(shape=shape, axes=axes, devices=jax.devices())


def global_shard_batch(batch, mesh, axis: str = "data"):
    """Assemble a GLOBAL batch from per-process local shards.

    Each process passes only its local slice (global_batch /
    process_count rows); the returned jax.Arrays are globally sharded
    along ``axis``. Single-process meshes fall back to a plain sharded
    device_put so the same feed code runs everywhere.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)

    n_proc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=global_shape)

    return jax.tree_util.tree_map(put, batch)


def process_local_slice(n_items: int) -> slice:
    """Which rows of a global dataset this process should load."""
    import jax

    per = n_items // max(jax.process_count(), 1)
    start = jax.process_index() * per
    return slice(start, start + per)
