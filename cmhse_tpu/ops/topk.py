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
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

# gallery-rows-per-chunk CAP; actual chunks are equalized (and rounded to
# the group width) so the final chunk carries no large padding. Measured at
# Q=1024/N=100k/D=1024 on v5e (equalized + single merge): cap 8192 -> 158k
# QPS, 16384 -> 170k, 32768 -> 207k (vs 200k fully-dense), 65536 -> 193k.
# 32768 is both the fastest AND caps the peak block at Q x 32k f32 = 128 MB
# per 1024 queries — faster than dense with bounded memory. The grouped
# pre-select (below) lifts 100k to 263k.
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
    chunk: int = TOPK_CHUNK,
    convert: bool = True,
) -> PreparedGallery:
    """Pad + equalize-chunk (+ bf16-convert on TPU, ``convert=True``) a
    gallery once. ``convert=False`` is the per-call path inside
    :func:`streaming_sim_topk` (XLA handles the dot-operand conversion
    there); both paths share THIS function so the subtle chunk-equalization
    arithmetic exists exactly once."""
    n, _ = gallery.shape
    # equalize: smallest chunk size that covers N in the same number of
    # chunks as the cap would — a padded FINAL chunk is wasted GEMM
    # (measured 31% at the worst alignment) — rounded up to the pre-select
    # group width so the grouped path needs no column pad (a [Q, chunk]
    # pad op cost 12.5 ms/call at N=1M in the op profile)
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
    chunk: int = TOPK_CHUNK,
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
      chunk: CAP on gallery rows per scan step (static); actual chunks are
        equalized so the final chunk carries no large padding.

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

    def _chunk_topk(sims):
        """Exact top-kk of one [Q, chunk] block; grouped pre-select when the
        chunk is wide enough that a full-width ``lax.top_k`` dominates.

        Grouped pre-select is EXACT including tie order: partition columns
        into groups of _GROUP, reduce each to its max (a strided
        ``reduce_window`` — NOT a 3D reshape, whose layout copy cost
        12.5 ms/call at N=1M in the op profile), take the top-kk groups
        (stable), gather those kk*_GROUP candidate columns from the 2D
        block, and run the real top-k on them. Any element of the true
        top-kk must live in a selected group — were its group unselected,
        kk groups would beat it by (max, group-index), each contributing an
        element that beats it in dense tie order too, contradicting
        membership. Selected group ids are re-sorted ASCENDING before the
        gather so the candidate row is in ascending column order and the
        stable final top_k reproduces dense tie-breaking exactly.
        """
        c = sims.shape[1]
        ngroups = -(-c // _GROUP)
        if ngroups < 2 * kk:
            return jax.lax.top_k(sims, kk)
        if ngroups * _GROUP != c:
            # only reachable via a caller-forced unaligned chunk (the
            # equalized path rounds chunks to _GROUP); -inf-padded columns
            # can never surface under the k <= n_valid contract
            sims = jnp.pad(sims, ((0, 0), (0, ngroups * _GROUP - c)),
                           constant_values=-jnp.inf)
        # NOTE a 2D take_along_axis(sims, cols) formulation (with a strided
        # reduce_window for gmax) measured 15x SLOWER on v5e — XLA lowers
        # the arbitrary-column gather scalar-by-scalar. The 3D reshape costs
        # a layout copy but its axis-1 group gather lowers to dynamic
        # slices; keep this shape.
        grp = sims.reshape(q, ngroups, _GROUP)
        gmax = jnp.max(grp, axis=2)  # [Q, ngroups]
        _, gsel = jax.lax.top_k(gmax, kk)
        gsel = jnp.sort(gsel, axis=1)  # ascending: dense tie order
        cand = jnp.take_along_axis(grp, gsel[:, :, None], axis=1)
        cols = gsel[:, :, None] * _GROUP + jnp.arange(_GROUP)[None, None, :]
        cols = jnp.minimum(cols, c - 1)  # padded columns stay in range
        loc_s, sel = jax.lax.top_k(cand.reshape(q, kk * _GROUP), kk)
        loc_i = jnp.take_along_axis(cols.reshape(q, kk * _GROUP), sel,
                                    axis=1)
        return loc_s, loc_i

    def body(_, xs):
        g_c, v_c, ci = xs
        sims = jnp.dot(
            queries, g_c.T, preferred_element_type=jnp.float32
        )  # [Q, chunk] — the ONLY similarity block ever materialized
        sims = jnp.where(v_c[None, :], sims, -jnp.inf)
        loc_s, loc_i = _chunk_topk(sims)
        return None, (loc_s, loc_i + ci * chunk)

    _, (all_s, all_i) = jax.lax.scan(
        body, None, (g_chunks, v_chunks, jnp.arange(n_chunks, dtype=jnp.int32))
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
