"""Data-parallel training placement (SURVEY.md section 2b, primary strategy).

The reference is single-GPU; here the SAME jitted ``train_step`` runs 1-chip
or N-chip: parameters/optimizer state are replicated, the batch is sharded on
its leading dim, and XLA's partitioner inserts the gradient ``all-reduce``
over ICI. No pmap, no hand-written collectives — this is the idiomatic
jit-over-Mesh data parallelism (scaling-book recipe).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from cmhse_tpu.parallel.mesh import batch_sharding, replicated


def place_replicated(tree, mesh: Mesh):
    """Replicate a pytree (params / opt state) across the mesh."""
    return jax.device_put(tree, replicated(mesh))


def place_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard a Batch pytree along its leading (batch) dimension."""
    return jax.device_put(batch, batch_sharding(mesh, axis))


def place_state(state, mesh: Mesh):
    """Replicate a TrainState across the mesh (step/params/opt_state)."""
    return jax.device_put(state, replicated(mesh))
