"""Device mesh + sharding helpers (SURVEY.md section 2b/2c).

The reference is single-process single-GPU; parallelism here is first-class
and TPU-native: a named ``jax.sharding.Mesh``, sharding annotations on the
batch, and XLA-inserted collectives over ICI. Data parallelism is the
primary strategy (the GRU weights are far under one core's HBM, so TP/PP are
unnecessary — SURVEY.md section 2b); the mesh keeps a ``data`` axis name so a
model axis could be added without call-site changes.

Multi-host: call :func:`maybe_initialize_distributed` before mesh creation
when running on multi-host pods; it no-ops on single-process setups.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """``jax.distributed.initialize()`` for multi-host pods; harmless no-op
    when env vars are absent (single host)."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()


def make_mesh(
    shape: tuple[int, ...] = (-1,),
    axis_names: tuple[str, ...] = ("data",),
    devices: list | None = None,
) -> Mesh:
    """Create a named mesh; ``-1`` in shape takes all remaining devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if shape.count(-1) > 1:
        raise ValueError(f"at most one -1 allowed in mesh shape, got {shape}")
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape = tuple(len(devs) // known if s == -1 else s for s in shape)
    n = int(np.prod(shape))
    if n > len(devs):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devs)}")
    return Mesh(devs[:n].reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension of every leaf over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host-side Batch pytree onto the mesh, batch-dim sharded.

    Every array leaf of :class:`cmhse_tpu.data.batch.Batch` has the batch as
    its leading dim, so one PartitionSpec covers the whole pytree.
    """
    sharding = batch_sharding(mesh, axis)
    return jax.device_put(batch, sharding)
