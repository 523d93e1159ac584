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
    on single-host setups.

    Cloud TPU pod runtimes do NOT set ``JAX_COORDINATOR_ADDRESS`` — jax
    auto-detects the cluster when ``initialize()`` is called with no args —
    so the gate checks the pod environment markers too. Skipping the call
    on a real pod would leave ``jax.process_count() == 1`` on every host:
    each host would silently train an independent model on the full
    dataset while racing on the checkpoint directory.
    """
    import os

    explicit = os.environ.get("JAX_COORDINATOR_ADDRESS")
    # Multi-worker signal only: single-host Cloud TPU VMs ALSO set
    # TPU_WORKER_ID=0 and a one-entry TPU_WORKER_HOSTNAMES, and initializing
    # distributed there is wrong (ADVICE.md round 2). A slice is multi-host
    # iff the hostnames list has more than one entry.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_worker = len([h for h in hostnames.split(",") if h.strip()]) > 1
    megascale = os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if not (explicit or multi_worker or megascale):
        return
    # idempotent: a second fit() in one process (or a caller that already
    # initialized) must not raise RuntimeError from jax.distributed
    already = getattr(jax.distributed, "is_initialized", None)
    if already is not None and already():
        return
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
        if len(devs) % known:
            raise ValueError(
                f"mesh shape {shape}: {len(devs)} devices do not divide by "
                f"the fixed axes (product {known}) — a silent remainder "
                "would leave devices idle"
            )
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


