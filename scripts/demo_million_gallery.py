"""Million-item gallery serving demo on the real chip (production-scale
evidence for the streaming eval/serving paths).

A 1M x 1024 f32 gallery is 4 GB — it fits v5e HBM (16 GB), but any dense
[Q, N] similarity block is 4 GB per 1024-query block and the full [N, N]
eval matrix (4 TB) is absurd. Both streaming paths run at this size with
bounded memory:

  * ``pallas_rank_counts``     — O(Q) output, gallery tiles through VMEM;
  * ``streaming_sim_topk``     — [Q, chunk] peak block (~4 equalized
    chunks, capped at 256k rows), candidates merged once;
  * ``quantized_sim_topk``     — opt-in int8 pre-select + exact rescore.

The gallery is generated ON DEVICE (jax.random) so no 4 GB host array or
transfer exists. Run on an idle host: `python scripts/demo_million_gallery.py`.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from bench import _timed_scan

N, Q, D, K = 1_000_000, 1024, 1024, 10


def main():
    bench._enable_compile_cache()
    from cmhse_tpu.ops.pallas_sim import pallas_rank_counts
    from cmhse_tpu.ops.topk import streaming_sim_topk

    make = jax.jit(lambda key: jax.random.normal(key, (N, D), jnp.float32))
    gallery = make(jax.random.PRNGKey(0))  # device-resident, 4 GB
    queries = jax.jit(
        lambda key: jax.random.normal(key, (Q, D), jnp.float32)
    )(jax.random.PRNGKey(1))
    gallery.block_until_ready()
    pos = jnp.arange(Q, dtype=jnp.int32)

    def factory_ranks(n_iters):
        @jax.jit
        def run(seed, qs, gal):
            def body(carry, i):
                qq = qs + (seed + i.astype(jnp.float32)) * 1e-3
                pos_score = jnp.sum(
                    qq.astype(jnp.float32) * gal[:Q].astype(jnp.float32),
                    axis=1,
                )
                ranks = pallas_rank_counts(qq, gal, pos_score, pos_idx=pos)
                return carry + jnp.sum(ranks).astype(jnp.float32), None
            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iters))
            return total
        return lambda seed: run(seed, queries, gallery)

    def factory_topk(n_iters):
        @jax.jit
        def run(seed, qs, gal):
            def body(carry, i):
                qq = qs + (seed + i.astype(jnp.float32)) * 1e-3
                s, idx = streaming_sim_topk(qq, gal, K)
                return carry + jnp.sum(s) + jnp.sum(idx).astype(
                    jnp.float32), None
            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iters))
            return total
        return lambda seed: run(seed, queries, gallery)

    # serving scenario: the gallery is prepared ONCE (pad/chunk/convert
    # hoisted out of the query path) — what Retriever.build_gallery does
    from cmhse_tpu.ops.topk import prepare_topk_gallery, quantized_sim_topk

    prepared = jax.jit(prepare_topk_gallery)(gallery)
    jax.block_until_ready(prepared)

    def factory_topk_prepared(n_iters):
        @jax.jit
        def run(seed, qs, prep):
            def body(carry, i):
                qq = qs + (seed + i.astype(jnp.float32)) * 1e-3
                s, idx = streaming_sim_topk(qq, prep, K)
                return carry + jnp.sum(s) + jnp.sum(idx).astype(
                    jnp.float32), None
            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iters))
            return total
        return lambda seed: run(seed, queries, prepared)

    # opt-in int8 two-stage mode (Retriever(quantize=True)): int8
    # pre-select + exact f32 rescore of the candidate pool
    prepared_q = jax.jit(
        lambda g: prepare_topk_gallery(g, quantize=True))(gallery)
    jax.block_until_ready(prepared_q)

    def factory_topk_int8(n_iters):
        @jax.jit
        def run(seed, qs, prep):
            def body(carry, i):
                qq = qs + (seed + i.astype(jnp.float32)) * 1e-3
                s, idx = quantized_sim_topk(qq, prep, K)
                return carry + jnp.sum(s) + jnp.sum(idx).astype(
                    jnp.float32), None
            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iters))
            return total
        return lambda seed: run(seed, queries, prepared_q)

    out = {"gallery_rows": N, "query_block": Q, "k": K}
    for name, fac in (("rank_count_qps", factory_ranks),
                      ("topk_qps", factory_topk),
                      ("topk_prepared_qps", factory_topk_prepared),
                      ("topk_int8_qps", factory_topk_int8)):
        qps = Q / _timed_scan(fac, n_iters_pair=(2, 6))
        out[name] = round(qps, 1)
        print(f"{name}: {out[name]:,} QPS @ 1M gallery", flush=True)
    # int8-vs-exact agreement at this scale (one call each)
    es, ei = streaming_sim_topk(queries, prepared, K)
    _, qi = quantized_sim_topk(queries, prepared_q, K)
    import numpy as np
    agree = float(np.mean(
        (np.asarray(qi)[:, :, None] == np.asarray(ei)[:, None, :]).any(2)))
    out["int8_recall_vs_exact"] = round(agree, 5)
    print(f"int8_recall_vs_exact: {agree:.5f}", flush=True)

    # continuous-ingest latency at scale: appending a 10k-row batch into
    # the 1M-row prepared gallery (tail chunk + new rows only) vs the full
    # re-prepare it replaces — the append_to_prepared value proposition
    import time

    from cmhse_tpu.ops.topk import append_to_prepared

    new_rows = jax.jit(
        lambda key: jax.random.normal(key, (10_000, D), jnp.float32)
    )(jax.random.PRNGKey(7))
    new_rows.block_until_ready()
    append = jax.jit(
        lambda pg, rows: append_to_prepared(pg, rows, n_existing=N))
    reprep = jax.jit(lambda g: prepare_topk_gallery(g))
    jax.block_until_ready(append(prepared, new_rows))  # compile
    jax.block_until_ready(reprep(gallery))
    t0 = time.perf_counter()
    jax.block_until_ready(append(prepared, new_rows + 1.0))  # fresh args:
    t_append = time.perf_counter() - t0                      # relay memoizes
    t0 = time.perf_counter()
    jax.block_until_ready(reprep(gallery + 1.0))
    t_reprep = time.perf_counter() - t0
    out["ingest_append_ms_10k"] = round(t_append * 1e3, 1)
    out["ingest_reprepare_ms_1m"] = round(t_reprep * 1e3, 1)
    print(f"ingest 10k rows: append {t_append*1e3:.1f} ms vs full "
          f"re-prepare {t_reprep*1e3:.1f} ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
