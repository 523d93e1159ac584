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
indices are bit-identical to the production path on the same inputs:

  production — ops/topk.py as shipped (rolled scan before round 5;
               unroll=n_chunks after the fix landed)
  scan       — rolled lax.scan over chunks (the pre-fix form)
  unroll     — lax.scan(..., unroll=n_chunks): no while loop at all
  pyloop     — Python for-loop over chunks (full unroll, no iota/stack)

``--quantized`` A/Bs the int8 two-stage path's pre-select loop instead.

VERDICT (run 2026-08-20, v5e, N=1M/Q=1024/D=1024/k=10): rolled scan
52.98 ms/call standalone vs unroll/pyloop both 28.03 ms (1.9x), all
bit-identical — unroll=n_chunks adopted in ops/topk.py; full numbers in
PERFORMANCE.md "Standalone vs in-scan serving calls".

Run on the real chip, idle host: ``python scripts/topk_standalone_probe.py``.
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


def _variant_quantized(queries, pg, k: int, mode: str):
    """The grouped branch of quantized_sim_topk's int8 pre-select with a
    pluggable chunk loop (rolled scan vs full unroll), sharing the
    production rescore epilogue — mirrors ops/topk.py so the A/B isolates
    exactly the loop form."""
    import jax
    import jax.numpy as jnp

    from cmhse_tpu.ops.topk import (_GROUP, _grouped_preselect,
                                    _quantize_rows_int8, _round_to_bf16_bits)

    g8, s8, v_chunks = pg.int8_chunks, pg.int8_scale, pg.valid
    n_chunks, csize, d = g8.shape
    q = queries.shape[0]
    capacity = n_chunks * csize
    m = min(max(64, 4 * k), capacity)
    kk = min(max(k, -(-m // n_chunks)), csize)
    ngroups = csize // _GROUP
    assert ngroups * _GROUP == csize and ngroups >= 2 * kk
    qi, _ = _quantize_rows_int8(queries)
    g_feed = g8.reshape(n_chunks, ngroups, _GROUP, d)
    s_feed = s8.reshape(n_chunks, ngroups, _GROUP)
    v_feed = v_chunks.reshape(n_chunks, ngroups, _GROUP)

    def body(_, xs):
        g_c, s_c, v_c, ci = xs
        sims = jnp.einsum("qd,gkd->qgk", qi, g_c,
                          preferred_element_type=jnp.int32
                          ).astype(jnp.float32) * s_c[None]
        sims = jnp.where(v_c[None], sims, -jnp.inf)
        _, loc_i = _grouped_preselect(sims, kk)
        return None, loc_i + ci * csize

    _, all_i = jax.lax.scan(
        body, None,
        (g_feed, s_feed, v_feed, jnp.arange(n_chunks, dtype=jnp.int32)),
        unroll=n_chunks if mode in ("unroll", "pyloop") else 1)
    idx_m = jnp.swapaxes(all_i, 0, 1).reshape(q, n_chunks * kk)
    idx_m = jnp.sort(idx_m, axis=1)
    flat = pg.chunks.reshape(capacity, d)
    vflat = v_chunks.reshape(capacity)
    rows = jnp.take(flat, idx_m, axis=0)
    val_m = jnp.take(vflat, idx_m, axis=0)
    if flat.dtype == jnp.bfloat16:
        q_f = _round_to_bf16_bits(queries).astype(jnp.float32)
    else:
        q_f = queries.astype(jnp.float32)
    rescored = jnp.sum(rows.astype(jnp.float32) * q_f[:, None, :], axis=-1)
    rescored = jnp.where(val_m, rescored, -jnp.inf)
    scores, pos = jax.lax.top_k(rescored, k)
    idx = jnp.take_along_axis(idx_m, pos, axis=1)
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
    p.add_argument("--quantized", action="store_true",
                   help="A/B the int8 two-stage path's pre-select loop "
                        "instead of the exact path")
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
    from cmhse_tpu.ops.topk import (prepare_topk_gallery, quantized_sim_topk,
                                    streaming_sim_topk)
    from cmhse_tpu.utils.profiling import device_busy_seconds

    print("platform:", jax.devices()[0].platform, flush=True)
    kg, kq = jax.random.split(jax.random.PRNGKey(0))
    gallery = l2norm(jax.random.normal(kg, (args.n, args.d), jnp.float32))
    pg = prepare_topk_gallery(gallery, quantize=args.quantized)
    del gallery
    queries = l2norm(jax.random.normal(kq, (args.reps + 1, args.q, args.d),
                                       jnp.float32))
    jax.block_until_ready((pg, queries))

    # reference output from the production path, for exactness checks
    prod = (functools.partial(quantized_sim_topk, k=args.k)
            if args.quantized
            else functools.partial(streaming_sim_topk, k=args.k))
    variant = _variant_quantized if args.quantized else _variant_topk
    ref_s, ref_i = prod(queries[0], pg)
    ref_s, ref_i = np.asarray(ref_s), np.asarray(ref_i)

    out = {"n": args.n, "q": args.q, "d": args.d, "k": args.k,
           "quantized": args.quantized, "per_call_ms": {}, "qps": {}}
    for mode in args.modes:
        if mode == "production":
            fn = prod
        else:
            fn = jax.jit(functools.partial(variant, k=args.k, mode=mode))
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
