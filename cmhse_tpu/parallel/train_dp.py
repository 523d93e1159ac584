"""Data-parallel training placement (SURVEY.md section 2b, primary strategy).

The reference is single-GPU; here the SAME jitted ``train_step`` runs 1-chip
or N-chip: parameters/optimizer state are replicated, the batch is sharded on
its leading dim, and XLA's partitioner inserts the gradient ``all-reduce``
over ICI. No pmap, no hand-written collectives — this is the idiomatic
jit-over-Mesh data parallelism (scaling-book recipe).

Multi-host (SURVEY.md section 2c): ``jax.device_put(host_array, sharding)``
is only correct when every device is process-local. On a multi-host pod each
process feeds ONLY its slice of the global batch (the loader emits local
rows via its ``process_index``/``process_count`` arguments, see
``data/loader.py``), and :func:`place_batch_global` assembles the global
sharded array with ``jax.make_array_from_process_local_data`` — no
cross-host data movement (each host's rows land on its own devices; the
gradient all-reduce over DCN is still XLA's job).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from cmhse_tpu.parallel.mesh import batch_sharding, replicated


def place_replicated(tree, mesh: Mesh):
    """Replicate a pytree (params / opt state) across the mesh."""
    return jax.device_put(tree, replicated(mesh))


def _sharding_for_dim(mesh: Mesh, axis: str, batch_dim: int):
    from jax.sharding import NamedSharding, PartitionSpec as P

    if batch_dim == 0:
        return batch_sharding(mesh, axis)
    return NamedSharding(mesh, P(*([None] * batch_dim), axis))


def place_batch(batch, mesh: Mesh, axis: str = "data", batch_dim: int = 0):
    """Shard a Batch pytree along its batch dimension.

    ``batch_dim``: which leaf dimension carries the batch — 0 for a plain
    Batch, 1 for a host-stacked ``[K, B, ...]`` multi-step group
    (``train_steps`` scans over dim 0, so the DP shard lives on dim 1).

    Single-process: a plain async ``device_put``. Multi-process: the batch
    must hold only THIS process's rows; the global array is assembled via
    :func:`place_batch_global`.
    """
    if jax.process_count() > 1:
        return place_batch_global(batch, mesh, axis, batch_dim=batch_dim)
    return jax.device_put(batch, _sharding_for_dim(mesh, axis, batch_dim))


def place_batch_global(local_batch, mesh: Mesh, axis: str = "data",
                       process_count: int | None = None,
                       batch_dim: int = 0):
    """Assemble a globally-sharded batch from per-process local rows.

    ``local_batch`` leaves have shape ``[B_local, ...]`` (``batch_dim=0``)
    or ``[K, B_local, ...]`` (``batch_dim=1``, stacked multi-step group)
    where ``B_global = B_local * process_count``; every leaf is placed with
    ``jax.make_array_from_process_local_data`` so each host's rows land on
    its own addressable devices (row-major process order — the loader slices
    the global batch the same way, see ``batches_from_dataset``).

    ``process_count`` is overridable for single-process testing of the
    assembly math (the driver's CPU mesh has one process).
    """
    pc = jax.process_count() if process_count is None else process_count
    sharding = _sharding_for_dim(mesh, axis, batch_dim)

    def put(x):
        x = np.asarray(x)
        global_shape = list(x.shape)
        global_shape[batch_dim] *= pc
        return jax.make_array_from_process_local_data(
            sharding, x, tuple(global_shape)
        )

    return jax.tree.map(put, local_batch)


def place_state(state, mesh: Mesh):
    """Replicate a TrainState across the mesh (step/params/opt_state)."""
    return jax.device_put(state, replicated(mesh))
