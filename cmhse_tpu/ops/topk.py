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

# pre-select group width (columns reduced to one max before the top-k);
# 128 = one lane register row, and kk*_GROUP candidate columns per chunk
_GROUP = 128

# full-unroll bound for the chunk scan (see the unroll comment in
# streaming_sim_topk): the adaptive policy stays at 4 chunks up to ~1M
# rows and only crosses this bound past ~16M, but a caller-supplied small
# `chunk` on a large gallery could otherwise compile hundreds of unrolled
# GEMM bodies (minutes of XLA compile) for zero benefit
_MAX_UNROLL = 64


def _cdiv(a: int, b: int) -> int:
    """Ceil-div on Python ints (the chunk-equalization arithmetic reads
    terribly as nested ``-(-a // b)``)."""
    return -(-a // b)


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
    # present only when prepared with quantize=True (the int8 serving path,
    # :func:`quantized_sim_topk`): per-row symmetric int8 values + scales
    int8_chunks: Array | None = None  # [n_chunks, chunk, D] i8
    int8_scale: Array | None = None   # [n_chunks, chunk] f32


def _round_to_bf16_bits(x: Array) -> Array:
    """f32 -> bf16 with round-to-nearest-even, via integer bits.

    Exists because a plain ``x.astype(bf16)`` whose result is widened back
    to f32 forms an excess-precision convert pair that XLA on TPU is
    allowed to (and does) ELIDE — the value silently stays full-precision
    f32. When bit-parity with a physically-rounded path matters (the
    quantized rescore vs the exact MXU dot), the rounding must be opaque
    to the simplifier. Finite inputs only (embeddings)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    bias = jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    hi = ((u + bias) >> 16).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(hi, jnp.bfloat16)


def _quantize_rows_int8(x: Array) -> tuple[Array, Array]:
    """Per-row symmetric int8 quantization: ``(values i8, scale f32[rows])``
    with ``x ~= values * scale[:, None]``. All-zero rows get scale 1."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


def prepare_topk_gallery(
    gallery: Array,
    valid: Array | None = None,
    chunk: int | None = None,
    convert: bool = True,
    quantize: bool = False,
) -> PreparedGallery:
    """Pad + equalize-chunk (+ bf16-convert on TPU, ``convert=True``) a
    gallery once. ``chunk=None`` (default) picks the measured-optimal
    adaptive chunking (see :data:`TOPK_NCHUNKS`); an explicit ``chunk``
    sets the chunk COUNT via ``ceil(n / chunk)`` — the realized rows per
    chunk are the equalized ``ceil(n / n_chunks)`` rounded UP to the
    128-wide pre-select group, so they can exceed ``chunk`` by up to 127
    (callers budgeting the peak [Q, chunk] block from this knob should
    budget the rounded value). ``convert=False`` is the per-call path
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
        n_chunks = adaptive_n_chunks(n)
    else:
        n_chunks = max(1, _cdiv(n, max(chunk, 1)))
    # equalized rows per chunk, rounded up to the pre-select group width;
    # floored at one group so an EMPTY gallery still yields a well-formed
    # (all-invalid, appendable) prepared form instead of zero-size chunks
    # that break the scan shapes and append_to_prepared's index arithmetic
    csize = max(_GROUP, _cdiv(_cdiv(n, n_chunks), _GROUP) * _GROUP)
    pad = n_chunks * csize - n
    g = jnp.pad(gallery, ((0, pad), (0, 0))) if pad else gallery
    gvalid = jnp.arange(n + pad) < n
    if valid is not None:
        gvalid = gvalid & jnp.pad(valid.astype(bool), (0, pad))
    int8_chunks = int8_scale = None
    if quantize:
        # quantize from the highest-precision form (pre-bf16-conversion)
        qv, qs = _quantize_rows_int8(g)
        int8_chunks = qv.reshape(n_chunks, csize, g.shape[-1])
        int8_scale = qs.reshape(n_chunks, csize)
    if (convert and jax.devices()[0].platform == "tpu"
            and g.dtype == jnp.float32):
        g = g.astype(jnp.bfloat16)  # see PreparedGallery docstring
    return PreparedGallery(
        chunks=g.reshape(n_chunks, csize, g.shape[-1]),
        valid=gvalid.reshape(n_chunks, csize),
        int8_chunks=int8_chunks,
        int8_scale=int8_scale,
    )


def append_to_prepared(
    pg: PreparedGallery,
    new_rows: Array,
    n_existing: int,
    valid: Array | None = None,
    convert: bool = True,
) -> PreparedGallery:
    """Append gallery rows to an existing :class:`PreparedGallery` without
    reprocessing it — the production serving story is a gallery that GROWS
    (new videos ingested continuously), and re-running
    :func:`prepare_topk_gallery` on every addition re-pads/re-converts (and
    re-quantizes) the whole multi-GB gallery for a handful of new rows.

    Only the final partially-filled chunk plus the new rows are
    REPROCESSED (pad/convert/quantize — O(chunk + m) compute); the
    fully-filled head chunks pass through untouched, so existing rows keep
    their global indices and appended rows take indices ``n_existing ...
    n_existing+m-1`` — exactly the dense-concatenation contract. Honesty
    about memory traffic: the head chunks ARE copied once into the new
    output buffer (XLA ``concatenate`` — buffers are immutable across jit
    calls), so the device cost is one full-gallery copy at HBM rate
    (measured ~17 ms for 1M x 1024 bf16 vs ~10 ms for a full re-prepare
    reading the 2x-bigger f32 source; scripts/demo_million_gallery.py).
    What append saves vs re-prepare is the f32 source read, the
    convert/quantize of every old row, and — when the caller has dropped
    the f32 gallery — needing it at all. The chunk SIZE is preserved (it is the scan's static shape);
    the chunk COUNT grows as needed. After many appends the chunk count
    drifts from the adaptive optimum — callers that care re-prepare from
    scratch when ``pg.chunks.shape[0]`` exceeds ~2x the fresh target
    (:class:`Retriever` does this automatically; measured cost of 2x the
    chunk count is a few percent, PERFORMANCE.md chunk sweeps).

    Args:
      pg: the prepared gallery to extend.
      n_existing: rows the prepared gallery currently represents (its true
        gallery length, BEFORE tail padding — the caller tracks it; the
        prepared form itself cannot distinguish tail padding from
        interleaved invalid rows).
      new_rows: ``[M, D]`` rows to append.
      valid: optional bool ``[M]`` validity of the new rows.
      convert: same policy as :func:`prepare_topk_gallery` (bf16 chunk
        storage on TPU).
    """
    n_chunks, csize, d = pg.chunks.shape
    if new_rows.shape[-1] != d:
        raise ValueError(f"new rows have D={new_rows.shape[-1]}, "
                         f"prepared gallery has D={d}")
    if not 0 <= n_existing <= n_chunks * csize:
        raise ValueError(f"n_existing={n_existing} outside the prepared "
                         f"capacity [0, {n_chunks * csize}]")
    m = new_rows.shape[0]
    if m == 0:
        return pg
    new_valid = (jnp.ones(m, bool) if valid is None
                 else valid.astype(bool))
    if (convert and jax.devices()[0].platform == "tpu"
            and new_rows.dtype == jnp.float32):
        new_rows_store = new_rows.astype(jnp.bfloat16)
    else:
        new_rows_store = new_rows
    if new_rows_store.dtype != pg.chunks.dtype:
        # mixed prepare/append platforms or dtypes: chunk storage is one
        # array, so unify on the existing storage dtype
        new_rows_store = new_rows_store.astype(pg.chunks.dtype)

    # rebuild only the tail region: the last partially-filled chunk's real
    # rows + the new rows, re-padded to a multiple of the (fixed) chunk size
    head = n_existing // csize          # fully-filled chunks, untouched
    tail_rows = n_existing - head * csize
    flat_tail = pg.chunks[head:].reshape(-1, d)[:tail_rows]
    flat_tail_valid = pg.valid[head:].reshape(-1)[:tail_rows]
    region = jnp.concatenate([flat_tail, new_rows_store])
    region_valid = jnp.concatenate([flat_tail_valid, new_valid])
    region_chunks = max(1, _cdiv(tail_rows + m, csize))
    pad = region_chunks * csize - (tail_rows + m)
    if pad:
        region = jnp.pad(region, ((0, pad), (0, 0)))
        region_valid = jnp.pad(region_valid, (0, pad))
    chunks = jnp.concatenate(
        [pg.chunks[:head], region.reshape(region_chunks, csize, d)])
    gvalid = jnp.concatenate(
        [pg.valid[:head], region_valid.reshape(region_chunks, csize)])

    int8_chunks = int8_scale = None
    if pg.int8_chunks is not None:
        # per-row quantization composes: only the new rows are quantized
        # (from their highest-precision form, matching prepare's order)
        tail_q = pg.int8_chunks[head:].reshape(-1, d)[:tail_rows]
        tail_s = pg.int8_scale[head:].reshape(-1)[:tail_rows]
        new_q, new_s = _quantize_rows_int8(new_rows)
        region_q = jnp.concatenate([tail_q, new_q])
        region_s = jnp.concatenate([tail_s, new_s])
        if pad:
            region_q = jnp.pad(region_q, ((0, pad), (0, 0)))
            region_s = jnp.pad(region_s, (0, pad))
        int8_chunks = jnp.concatenate(
            [pg.int8_chunks[:head], region_q.reshape(region_chunks, csize, d)])
        int8_scale = jnp.concatenate(
            [pg.int8_scale[:head], region_s.reshape(region_chunks, csize)])
    return PreparedGallery(chunks=chunks, valid=gvalid,
                           int8_chunks=int8_chunks, int8_scale=int8_scale)


def adaptive_n_chunks(n: int) -> int:
    """The chunk count :func:`prepare_topk_gallery` would pick for an
    ``n``-row gallery (exposed for re-chunk policies)."""
    n_chunks = max(TOPK_NCHUNKS, _cdiv(n, TOPK_CHUNK_CAP))
    return min(n_chunks, max(1, _cdiv(n, _GROUP)))


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


def _grouped_preselect(sims: Array, kk: int) -> tuple[Array, Array]:
    """Tie-order-EXACT grouped pre-select epilogue, shared by the exact
    (:func:`streaming_sim_topk`) and int8 (:func:`quantized_sim_topk`) scan
    bodies so the subtlety lives in exactly one place: reduce each group of
    ``sims [Q, ngroups, _GROUP]`` (already -inf-masked) to its max, take
    the top-``kk`` groups (stable), re-sort the selected group ids
    ASCENDING — so the gathered candidate row is in ascending column order
    and the stable final ``top_k`` reproduces dense tie-breaking exactly —
    then run the real top-k on the ``kk * _GROUP`` candidates.

    Returns ``(scores [Q, kk], local column indices [Q, kk])`` relative to
    the chunk this sims block came from."""
    q = sims.shape[0]
    gmax = jnp.max(sims, axis=2)  # [Q, ngroups]
    _, gsel = jax.lax.top_k(gmax, kk)
    gsel = jnp.sort(gsel, axis=1)  # ascending: dense tie order
    cand = jnp.take_along_axis(sims, gsel[:, :, None], axis=1)
    cols = gsel[:, :, None] * _GROUP + jnp.arange(_GROUP)[None, None, :]
    loc_s, sel = jax.lax.top_k(cand.reshape(q, kk * _GROUP), kk)
    loc_i = jnp.take_along_axis(cols.reshape(q, kk * _GROUP), sel, axis=1)
    return loc_s, loc_i


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
        if valid is not None:
            # the prepared form carries its OWN mask (set at prepare/
            # append/tombstone time); silently discarding a caller mask
            # here masked validity drift between a Retriever's raw
            # `gallery_valid` and `_prepared.valid` (review r5) — refuse
            # so the drift surfaces instead of serving deleted rows
            raise ValueError(
                "streaming_sim_topk(PreparedGallery, valid=...) is "
                "invalid: validity lives in the prepared form; pass "
                "valid=None (tombstone via the prepared mask instead)")
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
            loc_s, loc_i = _grouped_preselect(sims, kk)
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

    # unroll (n_chunks, capped): NO while loop in the compiled program. A rolled
    # scan compiles fine when this whole function is nested inside an
    # outer loop (how bench's slope timing runs it), but as a STANDALONE
    # program — what serving dispatches per request — XLA peels the last
    # iteration out of the while loop and the peeled body MATERIALIZES the
    # full [Q, ngroups, _GROUP] f32 sims stack (1 GB at N=1M/Q=1024) plus
    # a same-sized relayout copy that the in-loop body fuses away.
    # Measured on v5e at N=1M/Q=1024/D=1024/k=10, device-busy time:
    # rolled 52.98 ms/call vs unrolled 28.03 ms/call (1.9x), outputs
    # bit-identical; full A/B (incl. a Python-loop variant — equal to
    # unroll) in scripts/topk_standalone_probe.py, history in
    # PERFORMANCE.md. n_chunks is small by design (4 up to ~1M rows, then
    # N/262144 — see TOPK_NCHUNKS), so the unrolled program stays compact
    # for the adaptive path; _MAX_UNROLL bounds caller-forced small chunks
    # (beyond it the rolled scan's one peeled body amortizes anyway: the
    # peel costs ~one chunk's worth of materialized sims out of many).
    _, (all_s, all_i) = jax.lax.scan(
        body, None, (g_feed, v_feed, jnp.arange(n_chunks, dtype=jnp.int32)),
        unroll=n_chunks if n_chunks <= _MAX_UNROLL else 1,
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


@functools.partial(jax.jit, static_argnames=("k", "rescore_m"))
def quantized_sim_topk(
    queries: Array,
    prepared: PreparedGallery,
    k: int,
    rescore_m: int | None = None,
) -> tuple[Array, Array]:
    """Two-stage int8 top-k: quantized pre-select, exact rescore.

    Stage 1 runs the streaming scan on per-row symmetric int8 (v5e's MXU
    executes int8 dots at 2x the bf16 rate AND the gallery HBM read halves
    vs bf16), keeping each chunk's top ``ceil(rescore_m / n_chunks)``
    candidates (per-CHUNK depth, never below ``k``: capture is a per-chunk
    property — all k true tops could share one chunk). Stage 2 re-scores
    the whole surviving pool against the exact (bf16-on-TPU) gallery rows
    in f32 — products of bf16 values are exact in f32, so the rescored
    values equal :func:`streaming_sim_topk`'s MXU results up to f32
    summation order (~1e-7 relative) — and returns the top-k of the
    rescored values. Returned INDICES therefore differ from the exact path
    only if (a) a true top-k row falls outside the int8 pre-selection pool,
    or (b) two rows' true similarities are within summation-order noise.
    The per-query quantization SCALE is rank-neutral (a positive per-row
    factor), but the query's int8 ROUNDING perturbs pre-selection the same
    way gallery-side rounding does — both sides' noise sets the capture
    margin. Measured at
    N=1M/Q=1024/D=1024 on worst-case random unit vectors (near-ties
    everywhere): 79.6k QPS vs 38.7k exact (2.1x) with indices BIT-IDENTICAL
    to the exact path across all 1024x10 results; every true top-10 row
    landed at int8 rank <= 12 (PERFORMANCE.md). At 100k the exact path is
    already faster (sub-ms calls; the extra int8 stage does not pay) —
    this mode is for million-row-scale galleries. Formally still an OPT-IN
    approximate mode: capture is probabilistic, not proven.

    Candidates are re-sorted by ascending gallery index before the stable
    final top-k, so ties among CAPTURED candidates resolve to the lowest
    index, matching the dense path.

    Args:
      queries: ``[Q, D]`` f32 query embeddings.
      prepared: gallery from ``prepare_topk_gallery(..., quantize=True)``.
      k: results per query (caller clamps to the valid row count).
      rescore_m: total candidate-pool target (static; default
        ``max(64, 4*k)``, split across chunks, clamped to capacity).
        Larger = better capture, slower pre-select.
    """
    if prepared.int8_chunks is None:
        raise ValueError(
            "gallery was not prepared with quantize=True; call "
            "prepare_topk_gallery(gallery, valid, quantize=True)")
    q, d = queries.shape
    g8, s8, v_chunks = prepared.int8_chunks, prepared.int8_scale, prepared.valid
    n_chunks, csize, _ = g8.shape
    capacity = n_chunks * csize
    if k > capacity:
        raise ValueError(f"k={k} exceeds prepared gallery capacity")
    m = min(max(64, 4 * k) if rescore_m is None else rescore_m, capacity)
    if m < k:
        raise ValueError(f"rescore_m={m} must be >= k={k}")
    # per-chunk candidate depth; the full n_chunks*kk pool is rescored (a
    # global merge to exactly m measured as pure loss: it cannot improve
    # capture and its [Q, n_chunks*kk] top_k costs ~the same as rescoring
    # the extra rows)
    kk = min(max(k, _cdiv(m, n_chunks)), csize)
    ngroups = csize // _GROUP

    qi, _ = _quantize_rows_int8(queries)  # query scale is rank-neutral

    if ngroups * _GROUP == csize and ngroups >= 2 * kk:
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
    else:
        g_feed, s_feed, v_feed = g8, s8, v_chunks

        def body(_, xs):
            g_c, s_c, v_c, ci = xs
            sims = jnp.dot(qi, g_c.T, preferred_element_type=jnp.int32
                           ).astype(jnp.float32) * s_c[None, :]
            sims = jnp.where(v_c[None, :], sims, -jnp.inf)
            _, loc_i = jax.lax.top_k(sims, kk)
            return None, loc_i + ci * csize

    # unroll=n_chunks: same standalone-call peeling hazard (and fix) as
    # streaming_sim_topk's scan — see the comment there. Measured on v5e
    # at N=1M/Q=1024/k=10: rolled 23.85 ms/call standalone vs 13.89 ms
    # unrolled (73.7k QPS), bit-identical
    # (scripts/topk_standalone_probe.py --quantized).
    _, all_i = jax.lax.scan(
        body, None, (g_feed, s_feed, v_feed,
                     jnp.arange(n_chunks, dtype=jnp.int32)),
        unroll=n_chunks if n_chunks <= _MAX_UNROLL else 1)
    idx_m = jnp.swapaxes(all_i, 0, 1).reshape(q, n_chunks * kk)

    # exact rescore of the captured pool: ascending-index order so the
    # stable final top_k reproduces dense tie-breaking among captured rows.
    # Arithmetic: bf16-valued rows/queries multiplied and accumulated in
    # f32 — bf16 products are EXACT in f32, so this equals the exact path's
    # MXU dot up to summation order. (A bf16 einsum here rounded each
    # product to bf16 before accumulating: ~3e-5 score error that swapped
    # rank-boundary neighbors — every "capture miss" in the first 1M
    # measurement was actually this.)
    idx_m = jnp.sort(idx_m, axis=1)
    flat = prepared.chunks.reshape(capacity, d)
    vflat = v_chunks.reshape(capacity)
    rows = jnp.take(flat, idx_m, axis=0)            # [Q, pool, D]
    val_m = jnp.take(vflat, idx_m, axis=0)          # [Q, pool]
    if flat.dtype == jnp.bfloat16:
        # round the query to bf16 exactly as the exact path's MXU dot sees
        # it — but via integer bits, because `astype(bf16).astype(f32)`
        # is an excess-precision pair XLA ELIDES on TPU, silently leaving
        # the query unrounded here while the exact path's cast (consumed
        # by a bf16 dot) physically rounds. The ~5e-5 score skew between
        # the two paths swapped rank-boundary neighbors; chased to this
        # in the round-3 1M-recall investigation (PERFORMANCE.md).
        q_f = _round_to_bf16_bits(queries).astype(jnp.float32)
    else:
        q_f = queries.astype(jnp.float32)
    # elementwise multiply + reduce, NOT a batched-matvec dot (a [m, D] x
    # [D, 1] dot is MXU-degenerate; this VPU form also measured fastest:
    # 0.56 vs 0.82 ms at Q=1024, m=40). bf16-VALUED operands multiplied in
    # f32 are exact products, accumulated in f32 — equal to the exact
    # path's MXU result up to f32 summation order.
    rescored = jnp.sum(rows.astype(jnp.float32) * q_f[:, None, :],
                       axis=-1)
    rescored = jnp.where(val_m, rescored, -jnp.inf)
    scores, pos = jax.lax.top_k(rescored, k)
    idx = jnp.take_along_axis(idx_m, pos, axis=1)
    return scores, idx
