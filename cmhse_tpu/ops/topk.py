"""Streaming large-gallery top-k (SURVEY.md section 2a eval-side row; the
serving analogue of ``pallas_rank_counts``).

``Retriever.retrieve`` / ``sharded_sim_topk`` used to materialize the full
``[Q, N]`` similarity block at any gallery size — 800 MB for a 2048-query
block against a 100k gallery (VERDICT r2 missing 2). This module computes
top-k by scanning gallery CHUNKS:

    per chunk: sims = Q @ G_c^T      (MXU GEMM, [Q, C] block)
               local top-k            (lax.top_k over the chunk)
    finally:   ONE merge top-k over the [Q, n_chunks*k'] stacked candidates

Peak similarity memory is ``[Q, chunk]`` regardless of N (chunk capped at
:data:`TOPK_CHUNK_CAP` rows). Three measured design points (v5e, Q=1024,
D=1024 — tuning history in PERFORMANCE.md): equal-size chunks, because a
padded final chunk is pure wasted GEMM (a fixed-32768 chunking padded
100k -> 131k rows and cost 31% QPS); a single final merge, because a
per-chunk running merge added ~25% (13 extra [Q, k+k'] top_k launches);
and FEW large chunks, because with the born-grouped 3D GEMM (below) the
remaining per-chunk cost is the selection epilogue (~4 equalized chunks is
the optimum at both 100k and 1M). Streaming BEATS the dense [Q, N] path
at the 100k gallery: 351k QPS vs 200k dense (the dense path pays one
giant [Q, N] top_k). Tie semantics match the dense path exactly:
candidates stack in chunk order (ascending global index) and
``lax.top_k`` is stable, so equal scores resolve to the lowest gallery
index.

A ``lax.scan`` (not a Pallas kernel) is the right tool here: the FLOPs are
one big GEMM per chunk, which XLA already schedules at full MXU rate, and a
top-k needs sort networks that Mosaic would make hard for no bandwidth win —
the similarity block is produced and consumed on-chip either way.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

# Adaptive chunking (chunk=None): equalize the gallery into
# max(TOPK_NCHUNKS, ceil(N / TOPK_CHUNK_CAP)) chunks. With the born-grouped
# 3D body the per-chunk GEMM runs at roofline and the cost that scales with
# chunk COUNT is the selection epilogue, so few large chunks win — measured
# at Q=1024/D=1024/k=10 on v5e: N=100k: 4x25k chunks 351k QPS vs 2x50k
# 310k vs 1x100k 333k; N=1M: 4x250k 38.6k vs 8x125k 37.6k vs 31x32k 29.4k.
# Four chunks is the sweet spot at BOTH scales; the cap bounds the peak
# similarity block ([Q, chunk] f32 <= 1 GB per 1024 queries) for galleries
# beyond ~1M rows.
TOPK_NCHUNKS = 4
TOPK_CHUNK_CAP = 262144

# legacy fixed per-chunk row cap for callers that pass an explicit `chunk`
# (tuning history in PERFORMANCE.md; with the pre-3D scalar epilogue this
# was the measured optimum)
TOPK_CHUNK = 32768

# pre-select group width (columns reduced to one max before the top-k);
# 128 = one lane register row, and kk*_GROUP candidate columns per chunk
_GROUP = 128


class PreparedGallery(NamedTuple):
    """Gallery pre-chunked for :func:`streaming_sim_topk` — the serving
    shape of 'encode once, prepare once, answer queries forever'.

    The per-call path re-pads, re-chunks and (on TPU) re-converts the WHOLE
    gallery on every invocation — 18 ms/call of the 1M-gallery profile, pure
    loop-invariant work. ``prepare_topk_gallery`` hoists it. On TPU the
    chunks are stored bf16, which is NUMERICALLY IDENTICAL to the unprepared
    path: XLA's default f32 dot on TPU converts both operands to bf16 for
    the multiplies anyway; off-TPU chunks stay in the source dtype (matching
    the true-f32 CPU dot), so parity with the dense path holds everywhere.
    """

    chunks: Array  # [n_chunks, chunk, D]
    valid: Array   # bool [n_chunks, chunk]


def prepare_topk_gallery(
    gallery: Array,
    valid: Array | None = None,
    chunk: int | None = None,
    convert: bool = True,
) -> PreparedGallery:
    """Pad + equalize-chunk (+ bf16-convert on TPU, ``convert=True``) a
    gallery once. ``chunk=None`` (default) picks the measured-optimal
    adaptive chunking (see :data:`TOPK_NCHUNKS`); an explicit ``chunk``
    caps rows per chunk instead. ``convert=False`` is the per-call path
    inside :func:`streaming_sim_topk` (XLA handles the dot-operand
    conversion there); both paths share THIS function so the subtle
    chunk-equalization arithmetic exists exactly once."""
    n, _ = gallery.shape
    # equalize: smallest chunk size that covers N in the target number of
    # chunks — a padded FINAL chunk is wasted GEMM (measured 31% at the
    # worst alignment) — rounded up to the pre-select group width so the
    # grouped path needs no column pad (a [Q, chunk] pad op cost
    # 12.5 ms/call at N=1M in the op profile)
    if chunk is None:
        n_chunks = max(TOPK_NCHUNKS, -(-n // TOPK_CHUNK_CAP))
        # degenerate tiny galleries: never more chunks than _GROUP-wide rows
        n_chunks = min(n_chunks, max(1, -(-n // _GROUP)))
    else:
        n_chunks = max(1, -(-n // max(chunk, 1)))
    csize = -(-(-(-n // n_chunks)) // _GROUP) * _GROUP
    pad = n_chunks * csize - n
    g = jnp.pad(gallery, ((0, pad), (0, 0))) if pad else gallery
    gvalid = jnp.arange(n + pad) < n
    if valid is not None:
        gvalid = gvalid & jnp.pad(valid.astype(bool), (0, pad))
    if (convert and jax.devices()[0].platform == "tpu"
            and g.dtype == jnp.float32):
        g = g.astype(jnp.bfloat16)  # see PreparedGallery docstring
    return PreparedGallery(
        chunks=g.reshape(n_chunks, csize, g.shape[-1]),
        valid=gvalid.reshape(n_chunks, csize),
    )


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
    gallery: Array | PreparedGallery,
    k: int,
    valid: Array | None = None,
    chunk: int | None = None,
) -> tuple[Array, Array]:
    """Top-k gallery scores+indices for each query, streaming the gallery.

    Args:
      queries: ``[Q, D]`` query embeddings.
      gallery: ``[N, D]`` gallery embeddings, or a :class:`PreparedGallery`
        (pre-chunked once via :func:`prepare_topk_gallery` — the serving
        path; skips the per-call pad/chunk/convert, ``valid``/``chunk`` are
        then ignored).
      k: candidates to return (caller clamps to the valid row count).
      valid: optional bool ``[N]``; False rows can never surface.
      chunk: None (default) = adaptive equalized chunking (see
        :data:`TOPK_NCHUNKS`); an int CAPS gallery rows per scan step
        (static); actual chunks are always equalized so the final chunk
        carries no large padding.

    Returns: (scores ``[Q, k]`` f32 desc-sorted, indices ``[Q, k]`` i32),
    identical — including tie order — to a dense masked ``lax.top_k``.
    """
    q, d = queries.shape
    if isinstance(gallery, PreparedGallery):
        g_chunks, v_chunks = gallery.chunks, gallery.valid
        n_chunks, chunk, _ = g_chunks.shape
        if k > n_chunks * chunk:
            raise ValueError(f"k={k} exceeds prepared gallery capacity")
    else:
        n = gallery.shape[0]
        if k > n:
            raise ValueError(f"k={k} exceeds gallery size {n}")
        prep = prepare_topk_gallery(gallery, valid, chunk, convert=False)
        g_chunks, v_chunks = prep.chunks, prep.valid
        n_chunks, chunk, _ = g_chunks.shape
    if g_chunks.dtype == jnp.bfloat16 and queries.dtype == jnp.float32:
        # prepared-on-TPU chunks are bf16; casting the (small) query block
        # reproduces exactly what XLA's default f32 dot does to both sides
        queries = queries.astype(jnp.bfloat16)
    kk = min(k, chunk)
    ngroups = chunk // _GROUP

    if ngroups * _GROUP == chunk and ngroups >= 2 * kk:
        # Grouped pre-select with BORN-GROUPED similarities: the gallery
        # chunk is viewed as [ngroups, _GROUP, D] and the per-chunk GEMM is
        # a 3D dot producing sims directly in [Q, ngroups, _GROUP] layout —
        # no [Q, chunk] 2D block ever exists, so the 2D->3D group-reshape
        # layout copy that dominated the 1M-gallery op profile is gone
        # (measured 19.3k -> 29.4k QPS at N=1M, Q=1024, D=1024 on v5e; the
        # gallery-side reshape below is hoisted out of the scan and touches
        # the already-chunked layout only once per call).
        #
        # Grouped pre-select is EXACT including tie order: reduce each
        # group to its max, take the top-kk groups (stable), gather those
        # kk*_GROUP candidate columns, and run the real top-k on them. Any
        # element of the true top-kk must live in a selected group — were
        # its group unselected, kk groups would beat it by (max,
        # group-index), each contributing an element that beats it in dense
        # tie order too, contradicting membership. Selected group ids are
        # re-sorted ASCENDING before the gather so the candidate row is in
        # ascending column order and the stable final top_k reproduces
        # dense tie-breaking exactly.
        #
        # NOTE a 2D take_along_axis(sims, cols) formulation (with a strided
        # reduce_window for gmax) measured 15x SLOWER on v5e — XLA lowers
        # the arbitrary-column gather scalar-by-scalar. The 3D axis-1 group
        # gather lowers to dynamic slices; keep this shape.
        g_feed = g_chunks.reshape(n_chunks, ngroups, _GROUP, d)
        v_feed = v_chunks.reshape(n_chunks, ngroups, _GROUP)

        def body(_, xs):
            g_c, v_c, ci = xs
            sims = jnp.einsum(
                "qd,gkd->qgk", queries, g_c,
                preferred_element_type=jnp.float32,
            )  # [Q, ngroups, _GROUP] — the ONLY similarity block ever made
            sims = jnp.where(v_c[None], sims, -jnp.inf)
            gmax = jnp.max(sims, axis=2)  # [Q, ngroups]
            _, gsel = jax.lax.top_k(gmax, kk)
            gsel = jnp.sort(gsel, axis=1)  # ascending: dense tie order
            cand = jnp.take_along_axis(sims, gsel[:, :, None], axis=1)
            cols = (gsel[:, :, None] * _GROUP
                    + jnp.arange(_GROUP)[None, None, :])
            loc_s, sel = jax.lax.top_k(cand.reshape(q, kk * _GROUP), kk)
            loc_i = jnp.take_along_axis(cols.reshape(q, kk * _GROUP), sel,
                                        axis=1)
            return None, (loc_s, loc_i + ci * chunk)
    else:
        # narrow chunk (ngroups < 2*kk: pre-select would not shrink the
        # top-k) or a caller-forced non-_GROUP-aligned chunk: plain 2D GEMM
        # + full-width top_k per chunk
        g_feed, v_feed = g_chunks, v_chunks

        def body(_, xs):
            g_c, v_c, ci = xs
            sims = jnp.dot(
                queries, g_c.T, preferred_element_type=jnp.float32
            )  # [Q, chunk] — the ONLY similarity block ever materialized
            sims = jnp.where(v_c[None, :], sims, -jnp.inf)
            loc_s, loc_i = jax.lax.top_k(sims, kk)
            return None, (loc_s, loc_i + ci * chunk)

    _, (all_s, all_i) = jax.lax.scan(
        body, None, (g_feed, v_feed, jnp.arange(n_chunks, dtype=jnp.int32))
    )  # [n_chunks, Q, kk] — k' candidates per chunk, tiny vs [Q, N]
    # stack in CHUNK ORDER (ascending global index): the stable final top_k
    # then resolves equal scores to the lowest gallery index, exactly like
    # one dense top_k over [Q, N]
    cat_s = jnp.swapaxes(all_s, 0, 1).reshape(q, n_chunks * kk)
    cat_i = jnp.swapaxes(all_i, 0, 1).reshape(q, n_chunks * kk)
    if n_chunks == 1 and kk == k:
        # single-chunk fast path: the chunk's own top-k IS the answer.
        # (`n_chunks * kk == k` was WRONG: with several chunks it returned
        # per-chunk candidates concatenated, not globally sorted — caught by
        # review; pinned in tests/test_topk.py::test_k_equals_capacity.)
        return cat_s, cat_i
    scores, pos = jax.lax.top_k(cat_s, k)
    idx = jnp.take_along_axis(cat_i, pos, axis=1)
    return scores, idx
