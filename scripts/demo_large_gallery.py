"""BASELINE config 5 demo: 10k-video gallery, similarity sharded across an
8-device mesh, on-device R@k / median-rank reduction.

Runs on the virtual CPU mesh by default (no TPU pod needed):

    python scripts/demo_large_gallery.py [--n 10000] [--dim 64]

Verifies the sharded ranks against the single-device path on a subsample,
then reports metrics + wall time for both sharding modes.
"""

import argparse
import os
import time

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + " --xla_force_host_platform_device_count=8").strip(),
)

import jax

if jax.config.jax_platforms and "axon" in str(jax.config.jax_platforms):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10_000)
    p.add_argument("--dim", type=int, default=64)
    args = p.parse_args()

    from cmhse_tpu.ops.ranking import retrieval_ranks
    from cmhse_tpu.ops.similarity import l2norm
    from cmhse_tpu.parallel.eval_sharded import (
        sharded_ranks,
        sharded_retrieval_metrics,
    )
    from cmhse_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((-1,), ("data",))
    print(f"mesh: {mesh.shape} over {jax.devices()[0].platform}")

    rng = np.random.RandomState(0)
    v = l2norm(jnp.asarray(rng.randn(args.n, args.dim).astype(np.float32)))
    t = l2norm(jnp.asarray(rng.randn(args.n, args.dim).astype(np.float32)))

    for mode in ("query", "gallery"):
        t0 = time.perf_counter()
        m = sharded_retrieval_metrics(v, t, mesh, ks=(1, 5, 10, 50),
                                      mode=mode)
        m = {k: float(x) for k, x in m.items()}
        dt = time.perf_counter() - t0
        print(f"[{mode}] {args.n}x{args.n} gallery in {dt:.1f}s: "
              f"v2p R@1={m['v2p_r@1']:.2f} R@10={m['v2p_r@10']:.2f} "
              f"MedR={m['v2p_medr']:.0f} rsum={m['rsum']:.1f}")

    # spot-check: first 256 queries must match the single-device ranks
    sub = 256
    single = np.asarray(
        retrieval_ranks(jnp.dot(v[:sub], t.T))
    )
    shard = np.asarray(sharded_ranks(v, t, mesh, mode="gallery"))[:sub]
    assert (single == shard).all(), "sharded ranks diverged!"
    print(f"spot-check OK: first {sub} ranks bit-identical to single-device")


if __name__ == "__main__":
    main()
