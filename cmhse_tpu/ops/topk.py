"""Streaming large-gallery top-k (SURVEY.md section 2a eval-side row; the
serving analogue of ``pallas_rank_counts``).

``Retriever.retrieve`` / ``sharded_sim_topk`` used to materialize the full
``[Q, N]`` similarity block at any gallery size — 800 MB for a 2048-query
block against a 100k gallery (VERDICT r2 missing 2). This module computes
top-k by scanning gallery CHUNKS with a running ``[Q, k]`` candidate set:

    per chunk: sims = Q @ G_c^T      (MXU GEMM, [Q, C] block)
               local top-k            (lax.top_k over the chunk)
               merge into running     (top-k over [Q, k + k'] candidates)

Peak similarity memory is ``[Q, chunk]`` regardless of N. The merge keeps
dense-path tie semantics: ``lax.top_k`` is stable (first occurrence wins
among equals) and the running candidates — always from LOWER global indices
— are concatenated first, so equal scores resolve to the lowest gallery
index exactly like one dense ``top_k`` over ``[Q, N]`` would.

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

# default gallery rows per scan step: [Q, 8192] f32 similarities at the
# serving block size (Q=2048) is 64 MB of HBM traffic per step — large
# enough that GEMM time dominates the top-k merge, small enough that
# galleries in the tens of millions stream comfortably
TOPK_CHUNK = 8192


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
      chunk: gallery rows per scan step (static).

    Returns: (scores ``[Q, k]`` f32 desc-sorted, indices ``[Q, k]`` i32),
    identical — including tie order — to a dense masked ``lax.top_k``.
    """
    q, d = queries.shape
    n = gallery.shape[0]
    if k > n:
        raise ValueError(f"k={k} exceeds gallery size {n}")
    chunk = min(chunk, max(n, 1))
    pad = (-n) % chunk
    g = jnp.pad(gallery, ((0, pad), (0, 0))) if pad else gallery
    npad = n + pad
    gvalid = jnp.arange(npad) < n
    if valid is not None:
        gvalid = gvalid & jnp.pad(valid.astype(bool), (0, pad))
    n_chunks = npad // chunk
    g_chunks = g.reshape(n_chunks, chunk, d)
    v_chunks = gvalid.reshape(n_chunks, chunk)
    kk = min(k, chunk)

    init = (
        jnp.full((q, k), -jnp.inf, jnp.float32),
        jnp.full((q, k), jnp.iinfo(jnp.int32).max, jnp.int32),
    )

    def body(carry, xs):
        run_s, run_i = carry
        g_c, v_c, ci = xs
        sims = jnp.dot(
            queries, g_c.T, preferred_element_type=jnp.float32
        )  # [Q, chunk] — the ONLY similarity block ever materialized
        sims = jnp.where(v_c[None, :], sims, -jnp.inf)
        loc_s, loc_i = jax.lax.top_k(sims, kk)
        glob_i = loc_i + ci * chunk
        # running candidates first: they carry lower global indices, so the
        # stable top_k resolves ties to the lowest index (dense semantics)
        cat_s = jnp.concatenate([run_s, loc_s], axis=1)
        cat_i = jnp.concatenate([run_i, glob_i], axis=1)
        new_s, pos = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (new_s, new_i), None

    (scores, idx), _ = jax.lax.scan(
        body, init, (g_chunks, v_chunks, jnp.arange(n_chunks, dtype=jnp.int32))
    )
    return scores, idx
