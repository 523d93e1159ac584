"""Streaming large-gallery top-k (SURVEY.md section 2a eval-side row; the
serving analogue of ``pallas_rank_counts``).

``Retriever.retrieve`` / ``sharded_sim_topk`` used to materialize the full
``[Q, N]`` similarity block at any gallery size — 800 MB for a 2048-query
block against a 100k gallery (VERDICT r2 missing 2). This module computes
top-k by scanning gallery CHUNKS:

    per chunk: sims = Q @ G_c^T      (MXU GEMM, [Q, C] block)
               local top-k            (lax.top_k over the chunk)
    finally:   ONE merge top-k over the [Q, n_chunks*k'] stacked candidates

Peak similarity memory is ``[Q, chunk]`` regardless of N. Two measured
design points (v5e, Q=1024, N=100k, D=1024 — see PERFORMANCE.md):
equal-size chunks, because a padded final chunk is pure wasted GEMM (a
fixed-32768 chunking padded 100k -> 131k rows and cost 31% QPS), and a
single final merge, because a per-chunk running merge added ~25% (13 extra
[Q, k+k'] top_k launches). With both, streaming BEATS the dense [Q, N]
path at the 100k gallery: 207k QPS vs 200k dense (the dense path pays one
giant [Q, N] top_k; per-chunk top_k over 4 x 25k columns is cheaper). Tie
semantics match the dense path exactly: candidates stack in chunk order
(ascending global index) and ``lax.top_k`` is stable, so equal scores
resolve to the lowest gallery index.

A ``lax.scan`` (not a Pallas kernel) is the right tool here: the FLOPs are
one big GEMM per chunk, which XLA already schedules at full MXU rate, and a
top-k needs sort networks that Mosaic would make hard for no bandwidth win —
the similarity block is produced and consumed on-chip either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

# gallery-rows-per-chunk CAP; actual chunks are equalized so the final
# chunk never pads more than n_chunks-1 rows. Measured at Q=1024/N=100k/
# D=1024 on v5e (equalized + single merge): cap 8192 -> 158k QPS, 16384 ->
# 170k, 32768 -> 207k (vs 200k fully-dense), 65536 -> 193k. 32768 is both
# the fastest AND caps the peak block at Q x 32k f32 = 128 MB per 1024
# queries — faster than dense with bounded memory.
TOPK_CHUNK = 32768


def should_stream_topk(n_gallery: int, force: bool | None = None) -> bool:
    """Dispatch policy for serving top-k. Unlike the Pallas rank-count
    kernel (TPU-only; interpret mode would be slow), the chunked scan runs
    natively everywhere, so the ONLY criterion is gallery size: streaming
    engages wherever a dense [Q, N] block would start to hurt. Reuses the
    measured rank-count crossover as the size threshold."""
    from cmhse_tpu.ops.pallas_sim import STREAMING_GALLERY_MIN

    if force is not None:
        return force
    return n_gallery >= STREAMING_GALLERY_MIN


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def streaming_sim_topk(
    queries: Array,
    gallery: Array,
    k: int,
    valid: Array | None = None,
    chunk: int = TOPK_CHUNK,
) -> tuple[Array, Array]:
    """Top-k gallery scores+indices for each query, streaming the gallery.

    Args:
      queries: ``[Q, D]`` query embeddings.
      gallery: ``[N, D]`` gallery embeddings.
      k: candidates to return (caller clamps to the valid row count).
      valid: optional bool ``[N]``; False rows can never surface.
      chunk: CAP on gallery rows per scan step (static); actual chunks are
        equalized so the final chunk carries no large padding.

    Returns: (scores ``[Q, k]`` f32 desc-sorted, indices ``[Q, k]`` i32),
    identical — including tie order — to a dense masked ``lax.top_k``.
    """
    q, d = queries.shape
    n = gallery.shape[0]
    if k > n:
        raise ValueError(f"k={k} exceeds gallery size {n}")
    # equalize: smallest chunk size that covers N in the same number of
    # chunks as the cap would — a padded FINAL chunk is wasted GEMM (see
    # module docstring; measured 31% at the worst alignment). Total padding
    # is < n_chunks rows.
    n_chunks = max(1, -(-n // max(chunk, 1)))
    chunk = -(-n // n_chunks)
    pad = n_chunks * chunk - n
    g = jnp.pad(gallery, ((0, pad), (0, 0))) if pad else gallery
    npad = n + pad
    gvalid = jnp.arange(npad) < n
    if valid is not None:
        gvalid = gvalid & jnp.pad(valid.astype(bool), (0, pad))
    g_chunks = g.reshape(n_chunks, chunk, d)
    v_chunks = gvalid.reshape(n_chunks, chunk)
    kk = min(k, chunk)

    def body(_, xs):
        g_c, v_c, ci = xs
        sims = jnp.dot(
            queries, g_c.T, preferred_element_type=jnp.float32
        )  # [Q, chunk] — the ONLY similarity block ever materialized
        sims = jnp.where(v_c[None, :], sims, -jnp.inf)
        loc_s, loc_i = jax.lax.top_k(sims, kk)
        return None, (loc_s, loc_i + ci * chunk)

    _, (all_s, all_i) = jax.lax.scan(
        body, None, (g_chunks, v_chunks, jnp.arange(n_chunks, dtype=jnp.int32))
    )  # [n_chunks, Q, kk] — k' candidates per chunk, tiny vs [Q, N]
    # stack in CHUNK ORDER (ascending global index): the stable final top_k
    # then resolves equal scores to the lowest gallery index, exactly like
    # one dense top_k over [Q, N]
    cat_s = jnp.swapaxes(all_s, 0, 1).reshape(q, n_chunks * kk)
    cat_i = jnp.swapaxes(all_i, 0, 1).reshape(q, n_chunks * kk)
    if n_chunks * kk == k:
        # single-chunk fast path: candidates are already the answer
        return cat_s, cat_i
    scores, pos = jax.lax.top_k(cat_s, k)
    idx = jnp.take_along_axis(cat_i, pos, axis=1)
    return scores, idx
