"""Standalone-call anatomy fix probe for the 1M exact streaming top-k.

scripts/profile_topk_1m.py found that the STANDALONE jitted
``streaming_sim_topk`` program (what serving actually runs per request)
is ~2x slower than the in-scan form every recorded QPS number was
measured in (``bench._timed_scan`` nests the call in a timing
``lax.scan``): XLA peels the last chunk iteration out of the while loop,
and the peeled body materializes the full [Q, ngroups, 128] f32 sims
block (1 GB) PLUS a 1 GB relayout copy the in-loop body fuses away —
53 ms/call device time vs the ~26.5 ms/call slope number at
N=1M/Q=1024/D=1024.

This probe A/Bs standalone variants of the grouped scan body on the real
chip by DEVICE-BUSY time (xplane), checking each variant's scores and
indices are bit-identical to the current path on the same inputs:

  scan     — current production code (lax.scan over chunks)
  unroll   — lax.scan(..., unroll=n_chunks): no while loop at all
  pyloop   — Python for-loop over chunks (full unroll, no iota/stack)

Run on the real chip, idle host: ``python scripts/topk_standalone_probe.py``.
Record the verdict in PERFORMANCE.md and adopt the winner in ops/topk.py.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import tempfile

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def _variant_topk(queries, pg, k: int, mode: str):
    """The grouped branch of streaming_sim_topk with a pluggable chunk
    loop. Mirrors ops/topk.py exactly (shared _grouped_preselect) so a
    winning mode can be adopted there verbatim."""
    import jax
    import jax.numpy as jnp

    from cmhse_tpu.ops.topk import _GROUP, _grouped_preselect

    g_chunks, v_chunks = pg.chunks, pg.valid
    n_chunks, chunk, d = g_chunks.shape
    q = queries.shape[0]
    if g_chunks.dtype == jnp.bfloat16 and queries.dtype == jnp.float32:
        queries = queries.astype(jnp.bfloat16)
    kk = min(k, chunk)
    ngroups = chunk // _GROUP
    assert ngroups * _GROUP == chunk and ngroups >= 2 * kk
    g_feed = g_chunks.reshape(n_chunks, ngroups, _GROUP, d)
    v_feed = v_chunks.reshape(n_chunks, ngroups, _GROUP)

    def chunk_body(g_c, v_c, ci):
        sims = jnp.einsum("qd,gkd->qgk", queries, g_c,
                          preferred_element_type=jnp.float32)
        sims = jnp.where(v_c[None], sims, -jnp.inf)
        loc_s, loc_i = _grouped_preselect(sims, kk)
        return loc_s, loc_i + ci * chunk

    if mode == "pyloop":
        outs = [chunk_body(g_feed[ci], v_feed[ci], ci)
                for ci in range(n_chunks)]
        all_s = jnp.stack([s for s, _ in outs])
        all_i = jnp.stack([i for _, i in outs])
    else:
        def body(_, xs):
            g_c, v_c, ci = xs
            return None, chunk_body(g_c, v_c, ci)

        _, (all_s, all_i) = jax.lax.scan(
            body, None,
            (g_feed, v_feed, jnp.arange(n_chunks, dtype=jnp.int32)),
            unroll=n_chunks if mode == "unroll" else 1)

    cat_s = jnp.swapaxes(all_s, 0, 1).reshape(q, n_chunks * kk)
    cat_i = jnp.swapaxes(all_i, 0, 1).reshape(q, n_chunks * kk)
    scores, pos = jax.lax.top_k(cat_s, k)
    idx = jnp.take_along_axis(cat_i, pos, axis=1)
    return scores, idx


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--q", type=int, default=1024)
    p.add_argument("--d", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--modes", nargs="+",
                   default=["scan", "unroll", "pyloop"])
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cmhse_tpu.ops.similarity import l2norm
    from cmhse_tpu.ops.topk import prepare_topk_gallery, streaming_sim_topk
    from cmhse_tpu.utils.profiling import device_busy_seconds

    print("platform:", jax.devices()[0].platform, flush=True)
    kg, kq = jax.random.split(jax.random.PRNGKey(0))
    gallery = l2norm(jax.random.normal(kg, (args.n, args.d), jnp.float32))
    pg = prepare_topk_gallery(gallery, quantize=False)
    del gallery
    queries = l2norm(jax.random.normal(kq, (args.reps + 1, args.q, args.d),
                                       jnp.float32))
    jax.block_until_ready((pg, queries))

    # reference output from the production path, for exactness checks
    ref_s, ref_i = streaming_sim_topk(queries[0], pg, k=args.k)
    ref_s, ref_i = np.asarray(ref_s), np.asarray(ref_i)

    out = {"n": args.n, "q": args.q, "d": args.d, "k": args.k,
           "per_call_ms": {}, "qps": {}}
    for mode in args.modes:
        if mode == "scan":
            fn = functools.partial(streaming_sim_topk, k=args.k)
        else:
            fn = jax.jit(functools.partial(_variant_topk, k=args.k,
                                           mode=mode))
        s, i = fn(queries[0], pg)
        jax.block_until_ready((s, i))
        exact = (np.array_equal(np.asarray(s), ref_s)
                 and np.array_equal(np.asarray(i), ref_i))
        on_tpu = jax.devices()[0].platform == "tpu"
        with tempfile.TemporaryDirectory() as td:
            import time

            t0 = time.perf_counter()
            with jax.profiler.trace(td):
                acc = jnp.float32(0)
                for r in range(args.reps):  # fresh args: relay memoizes
                    s, i = fn(queries[1 + r], pg)
                    acc = acc + s.sum() + i.sum()
                float(acc)
            # off-TPU (CPU smoke) there is no device plane: fall back to
            # wall clock, which is honest on a local backend
            busy = (device_busy_seconds(td) if on_tpu
                    else time.perf_counter() - t0)
        ms = busy / args.reps * 1e3
        out["per_call_ms"][mode] = round(ms, 2)
        out["qps"][mode] = round(args.q * args.reps / busy, 1)
        print(f"{mode:7s}: {ms:7.2f} ms/call device, "
              f"{out['qps'][mode]:>9,.1f} QPS, bit-identical={exact}",
              flush=True)
        assert exact, f"variant {mode} diverged from the production path"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
