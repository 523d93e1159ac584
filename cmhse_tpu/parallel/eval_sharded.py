"""Sharded similarity-matrix retrieval evaluation (BASELINE config 5:
10k-video gallery sharded across a v5e-8 mesh with on-device R@k /
median-rank reduction; SURVEY.md section 2b "SP" row).

Replaces the reference's host-side ``numpy`` eval loop (``evaluation.py``:
``sims = np.dot(...)`` + per-query ``argsort``; SURVEY.md section 3.2) with
rank-by-counting inside ``shard_map``:

    rank_i = 1 + sum_j [ sims[i, j] > sims[i, pos_i] ]

Two sharding modes, picked by which side is big:

  * ``query``  — query rows sharded over the mesh, gallery replicated.
    Zero collectives until the final median (a tiny [N] gather). Best when
    the gallery embedding matrix fits each core's HBM (10k x 1024 f32 =
    40 MB: it does, comfortably).
  * ``gallery`` — gallery columns sharded, queries replicated. Each device
    counts violations against its gallery shard; counts and the positive's
    score are combined with ``psum`` — O(N) scalars over ICI, never the
    N^2 matrix. This is the mode for galleries that outgrow one core.

Both modes produce EXACTLY the ranks of the single-device path (the compares
are elementwise; no float reassociation crosses a shard boundary), which is
what the parity tests pin (SURVEY.md section 4 item 4).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from cmhse_tpu.ops.pallas_sim import pallas_violation_counts, should_stream


def _pad_rows(x: Array, multiple: int) -> tuple[Array, int]:
    n = x.shape[0]
    rem = (-n) % multiple
    if rem:
        pad_width = ((0, rem),) + ((0, 0),) * (x.ndim - 1)
        x = jnp.pad(x, pad_width)
    return x, n

def _pad_gallery_valid(gallery, ndev, valid):
    """Pad rows to a multiple of ndev and fold caller validity into the
    padding mask (shared by sharded_ranks and the prepared variant;
    sharded_sim_topk caches its padded gallery separately and builds the
    mask via :func:`_padded_valid_mask` — the arithmetic lives there)."""
    g_pad, n = _pad_rows(gallery, ndev)
    npad = g_pad.shape[0]
    return g_pad, _padded_valid_mask(npad, n, valid), npad


def _padded_valid_mask(npad: int, n: int, valid):
    """The one home of the padded-row validity arithmetic: rows past the
    true count ``n`` are padding (never valid); caller tombstones fold in."""
    mask = jnp.arange(npad) < n
    if valid is not None:
        mask = mask & jnp.pad(valid, (0, npad - n))
    return mask


def _on_mesh(mesh, *pairs):
    """device_put each (array, spec) pair onto the mesh, matching the
    shard_map's in_specs. Needed because shard_map inputs must be PLACEABLE
    on its mesh: an array committed to a single device — e.g. anything
    computed from orbax-restored params, whose restore pins them to device
    0 and whose jits therefore pin their outputs too — otherwise raises
    'incompatible devices' (caught by the cmhse-serve sharded test; the
    same failure hits cmhse-retrieve --sharded on any restored checkpoint).
    device_put is a no-op for uncommitted or already-matching inputs."""
    return tuple(jax.device_put(a, NamedSharding(mesh, s)) for a, s in pairs)


def _merge_shard_candidates(loc_scores, glob_idx, axis, k):
    """all_gather each shard's k candidates (k*ndev floats over ICI) and
    take the global top-k — the shared tail of every sharded top-k body."""
    all_scores = jax.lax.all_gather(loc_scores, axis, axis=1, tiled=True)
    all_idx = jax.lax.all_gather(glob_idx, axis, axis=1, tiled=True)
    fin_scores, fin_pos = jax.lax.top_k(all_scores, k)
    fin_idx = jnp.take_along_axis(all_idx, fin_pos, axis=1)
    return fin_scores, fin_idx


def sharded_ranks(
    v_emb: Array,
    p_emb: Array,
    mesh: Mesh,
    axis: str = "data",
    mode: str = "query",
    valid: Array | None = None,
    streaming: bool | None = None,
) -> Array:
    """1-based rank of the aligned positive for every query row.

    Args:
      v_emb: ``[N, D]`` query embeddings (L2-normalized).
      p_emb: ``[N, D]`` gallery embeddings; row i is query i's positive.
      mesh: device mesh with axis ``axis``.
      mode: "query" (shard queries) or "gallery" (shard gallery columns).
      streaming: use the Pallas rank-count kernel inside each shard, so the
        per-device ``[Q, N/ndev]`` similarity block never reaches HBM.
        None = auto (TPU and per-device gallery >= STREAMING_GALLERY_MIN).

    Returns: ``[N]`` int32 ranks (same values as the single-device path),
    fully REPLICATED over the mesh — every process of a multi-host run can
    ``np.asarray`` the result directly.

    The whole computation (pad -> positive scores -> shard_map counting ->
    slice) compiles into ONE program, cached per (mesh, mode, stream,
    shapes): launching it is a single SPMD dispatch. The first version of
    this function ran the padding/positive-score/slice steps as ~10 EAGER
    ops on global arrays; on a multi-process (gloo) run every such op is
    its own collective program launch with its own rendezvous — measured
    at multi-second latency per op in the 2-process CPU test, and worse,
    re-tracing fresh ``shard_map`` objects per call defeated the in-memory
    executable cache. One cached program fixes both.
    """
    ndev = mesh.shape[axis]
    n = int(v_emb.shape[0])
    npad = n + ((-n) % ndev)
    stream = should_stream(npad, streaming)
    program = _ranks_program(mesh, axis, mode, stream, valid is not None)
    # inputs only need to LIVE on the mesh (single-device-COMMITTED arrays —
    # anything downstream of orbax-restored params — would otherwise crash
    # the program; see _on_mesh). Resharding to each stage's specs happens
    # inside the compiled program.
    args = _on_mesh(mesh, (v_emb, P(None, None)), (p_emb, P(None, None)))
    if valid is not None:
        args += _on_mesh(mesh, (valid, P(None)))
    return program(*args)


@lru_cache(maxsize=None)
def _ranks_program(mesh, axis: str, mode: str, stream: bool,
                   has_valid: bool):
    """Compiled-program cache for :func:`sharded_ranks`: one jitted
    (replicated-output) program per (mesh, axis, mode, stream, has_valid);
    jax retraces internally per concrete shape. Keeping the program object
    alive across calls is what lets repeated validations reuse the
    executable instead of re-tracing a fresh ``shard_map`` every time."""
    rep = NamedSharding(mesh, P())
    if has_valid:
        def fn(v_emb, p_emb, valid):
            return _sharded_ranks_impl(v_emb, p_emb, mesh, axis, mode,
                                       valid, stream)
    else:
        def fn(v_emb, p_emb):
            return _sharded_ranks_impl(v_emb, p_emb, mesh, axis, mode,
                                       None, stream)
    return jax.jit(fn, out_shardings=rep)


def _sharded_ranks_impl(v_emb, p_emb, mesh, axis, mode, valid, stream):
    """Traced body of :func:`sharded_ranks` (always runs under the cached
    jit of :func:`_ranks_program`)."""
    ndev = mesh.shape[axis]
    n = v_emb.shape[0]
    v_pad, _ = _pad_rows(v_emb, ndev)
    # padded gallery rows are all-zero => sim 0; guard by masking them out of
    # the counts with an explicit validity vector. Caller-supplied ``valid``
    # (device-resident galleries keep in-place padding rows) is folded in.
    p_pad, gallery_valid, npad = _pad_gallery_valid(p_emb, ndev, valid)
    pos_idx = jnp.arange(npad, dtype=jnp.int32)
    # ``stream`` was decided by the caller on the FULL gallery size npad:
    # the dense per-device block is [npad/ndev, npad] in query mode and
    # [npad, npad/ndev] in gallery mode — identical npad^2/ndev elements
    # either way — so npad is the right size for the measured crossover in
    # BOTH modes. Using the per-shard size deferred streaming until
    # npad >= MIN * ndev and let the dense branch materialize multi-GB
    # blocks at large N.
    # the positives are the ALIGNED rows, so each query's positive score is a
    # row-wise dot — same float32 reduction the GEMM diagonal would produce
    pos_score_full = jnp.sum(
        v_pad.astype(jnp.float32) * p_pad.astype(jnp.float32), axis=1
    )
    # NaN-positive sentinel: the VALID gallery size — matches both the
    # single-device retrieval_ranks path (which sees n rows) and the
    # compacted dense path when a caller validity mask drops rows, so the
    # metric does not depend on which execution path ranked the query
    worst = (
        jnp.int32(n) if valid is None
        else jnp.sum(valid.astype(jnp.int32))
    )

    if mode == "query":

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis, None), P(None, None), P(axis), P(None),
                      P(axis), P()),
            out_specs=P(axis),
            # the vma checker cannot see through interpret-mode pallas_call
            # block slicing; the streaming variant is parity-tested against
            # the dense path (which keeps the checker) instead
            check_vma=not stream,
        )
        def _ranks(v, p, pos, gvalid, pos_score_shard, worst_rank):
            if stream:
                counts = pallas_violation_counts(
                    v, p, pos_score_shard, gallery_valid=gvalid,
                    pos_idx=pos,  # global row idx == global gallery idx
                )
                pos_score = pos_score_shard
            else:
                sims = jnp.dot(v, p.T, preferred_element_type=jnp.float32)
                ps = jnp.take_along_axis(sims, pos[:, None], axis=1)
                greater = (sims > ps) & gvalid[None, :]
                counts = jnp.sum(greater, axis=1).astype(jnp.int32)
                pos_score = ps[:, 0]
            ranks = counts + 1
            # NaN positive => worst rank, never a bogus rank 1. Sentinel is
            # the VALID gallery size (not the padded size) so these ranks
            # match the single-device paths exactly even when N is not a
            # multiple of the device count (ADVICE.md round 1) or a caller
            # mask drops rows.
            return jnp.where(jnp.isnan(pos_score), worst_rank, ranks)

        ranks = _ranks(*_on_mesh(
            mesh, (v_pad, P(axis, None)), (p_pad, P(None, None)),
            (pos_idx, P(axis)), (gallery_valid, P(None)),
            (pos_score_full, P(axis)), (worst, P())))

    elif mode == "gallery":

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, None), P(axis, None), P(None), P(axis),
                      P(None), P()),
            out_specs=P(None),
            # see the query-mode comment: checker off only for streaming
            check_vma=not stream,
        )
        def _ranks(v, p_shard, pos, gvalid_shard, pos_score, worst_rank):
            shard_size = p_shard.shape[0]
            if stream:
                # positive column index local to this gallery shard
                # (out-of-range when another shard owns it)
                local_pos = pos - jax.lax.axis_index(axis) * shard_size
                local_counts = pallas_violation_counts(
                    v, p_shard, pos_score, gallery_valid=gvalid_shard,
                    pos_idx=local_pos,
                )
            else:
                # local similarity block: all queries x my gallery shard
                sims = jnp.dot(
                    v, p_shard.T, preferred_element_type=jnp.float32
                )
                # positive score FROM THE SAME GEMM (only the owning shard
                # contributes): keeps the dense path bit-identical to the
                # single-device ranks — a separately-reduced dot can differ
                # in the last ulps and flip near-tie comparisons
                shard_id = jax.lax.axis_index(axis)
                local_pos_d = pos - shard_id * shard_size
                in_shard = (local_pos_d >= 0) & (local_pos_d < shard_size)
                safe_pos = jnp.clip(local_pos_d, 0, shard_size - 1)
                pos_local = jnp.take_along_axis(
                    sims, safe_pos[:, None], axis=1
                )[:, 0]
                pos_score = jax.lax.psum(
                    jnp.where(in_shard, pos_local, 0.0), axis
                )
                greater = (sims > pos_score[:, None]) & gvalid_shard[None, :]
                local_counts = jnp.sum(greater, axis=1).astype(jnp.int32)
            counts = jax.lax.psum(local_counts, axis)
            ranks = counts + 1
            # valid-size sentinel: see the query-mode comment above
            return jnp.where(jnp.isnan(pos_score), worst_rank, ranks)

        ranks = _ranks(*_on_mesh(
            mesh, (v_pad, P(None, None)), (p_pad, P(axis, None)),
            (pos_idx, P(None)), (gallery_valid, P(axis)),
            (pos_score_full, P(None)), (worst, P())))
    else:
        raise ValueError(f"unknown mode {mode!r}")

    return ranks[:n]


def sharded_retrieval_metrics(
    v_emb: Array,
    p_emb: Array,
    mesh: Mesh,
    ks: tuple[int, ...] = (1, 5, 10, 50),
    axis: str = "data",
    mode: str = "query",
    valid: Array | None = None,
    streaming: bool | None = None,
    return_ranks: bool = False,
) -> dict[str, Array]:
    """Bidirectional R@k / MedR / MeanR over a sharded gallery.

    Mirrors :func:`cmhse_tpu.ops.ranking.bidirectional_metrics` but scales to
    galleries that don't fit one device. The final reductions (mean/median
    over ``[N]`` ranks) are negligible and run wherever XLA puts them.

    ``valid``: bool[N] row validity for device-resident galleries that keep
    padded rows in place (see ``encode_gallery_device``); invalid rows are
    excluded as both queries and gallery items.

    The rank computation is the only distributed work (one compiled SPMD
    program per direction — see :func:`sharded_ranks`); the metric
    reductions then run on HOST copies of the ``[N]`` rank vectors. On a
    multi-host pod this matters twice: every eager op on a global array is
    a separate collective program launch (a validation used to fire ~25 of
    them — multi-second gloo rendezvous each on the 2-process CPU test),
    and host-local math trivially cannot deadlock cross-process. The
    values are bit-identical either way: every metric is derived from
    integer ranks (sums/medians of small ints are exact in float32).
    """
    import numpy as np

    from cmhse_tpu.ops.ranking import bidirectional_metrics_from_ranks

    def rank_fn(a, b):
        # replicated output -> fully addressable on every process
        return np.asarray(
            sharded_ranks(a, b, mesh, axis=axis, mode=mode, valid=valid,
                          streaming=streaming))

    valid_host = None
    if valid is not None:
        # valid may be sharded (it rides out of the device-resident encode);
        # replicate before pulling to host — ONE tiny transfer program
        valid_host = np.asarray(
            jax.device_put(valid, NamedSharding(mesh, P())))

    return bidirectional_metrics_from_ranks(rank_fn, v_emb, p_emb,
                                            ks=ks, valid=valid_host,
                                            return_ranks=return_ranks)


def _sim_topk_body(q, g_shard, gvalid_shard, *, axis: str, k: int,
                   streaming: bool = False):
    """Per-device body of :func:`sharded_sim_topk`; module-level so the
    replication test (tests/test_sharded_eval.py) can run the SAME body with
    per-device out_specs and assert every device holds identical candidates
    after the all_gather — the property ``check_vma=False`` stops the
    compiler from checking."""
    shard_size = g_shard.shape[0]
    shard_id = jax.lax.axis_index(axis)
    kk = min(k, shard_size)
    if streaming:
        # large gallery: chunked scan over the shard — the per-device block
        # shrinks from [Q, N/ndev] to [Q, chunk] (VERDICT r2 missing 2)
        from cmhse_tpu.ops.topk import streaming_sim_topk

        loc_scores, loc_idx = streaming_sim_topk(
            q, g_shard, kk, valid=gvalid_shard
        )
    else:
        sims = jnp.dot(q, g_shard.T, preferred_element_type=jnp.float32)
        sims = jnp.where(gvalid_shard[None, :], sims, -jnp.inf)
        loc_scores, loc_idx = jax.lax.top_k(sims, kk)  # [Q, kk]
    glob_idx = loc_idx + shard_id * shard_size
    # gather candidates from all shards: [Q, kk*ndev]
    return _merge_shard_candidates(loc_scores, glob_idx, axis, k)


def sharded_sim_topk(
    queries: Array,
    gallery: Array,
    k: int,
    mesh: Mesh,
    axis: str = "data",
    valid: Array | None = None,
    streaming: bool | None = None,
) -> tuple[Array, Array]:
    """Serving path: top-k gallery hits for a query block against a
    column-sharded gallery (the "sim-matrix QPS" entry point, BASELINE.json:2;
    the reference has no serving path — SURVEY.md section 3.5).

    Per-device local top-k over its gallery shard, then an ``all_gather`` of
    the k candidates per shard (k*ndev << N floats, rides ICI), then a final
    top-k over candidates. Returns (scores ``[Q, k]``, global indices
    ``[Q, k]``).

    Compiled-program caching mirrors :func:`sharded_ranks` (whose docstring
    records the measured failure mode): ``Retriever._search`` calls this
    once per serving request, and building a fresh ``shard_map`` closure
    per call re-traced the program every request (review r5) — the pad +
    shard_map pipeline now compiles into one cached program per
    (mesh, axis, k, stream, has_valid, n), retraced by jax only per
    concrete shape. The GALLERY's pad + ``P(axis, None)`` placement is
    also cached, per gallery array (:func:`_placed_padded_gallery`):
    ``Retriever._search`` passes the same committed array on every
    request, and both re-scattering it per call and the first cached-
    program revision's replicated ``P()`` feed (ndev x the transfer AND
    a full per-device copy — review r5) made every request pay gallery-
    sized data movement.
    """
    n = int(gallery.shape[0])
    npad = n + ((-n) % mesh.shape[axis])
    # dispatch on the FULL gallery size, mirroring sharded_ranks: the dense
    # per-device block is [Q, npad/ndev] and the measured crossover was
    # calibrated against total-gallery scale
    from cmhse_tpu.ops.topk import should_stream_topk

    stream = should_stream_topk(npad, streaming)
    g_pad = _placed_padded_gallery(gallery, mesh, axis)
    # the [npad] validity mask is built EAGERLY (two trivial ops) so the
    # compiled program is keyed by padded shape alone: n moves on every
    # few-row add while npad moves once per ndev rows, and keying the
    # program on n compiled a fresh multi-second program per ingest step
    # (and grew the lru cache without bound — review r5)
    mask = _padded_valid_mask(npad, n, valid)
    program = _sim_topk_program(mesh, axis, k, stream)
    args = _on_mesh(mesh, (queries, P(None, None))) + (g_pad,)
    args += _on_mesh(mesh, (mask, P(None)))
    return program(*args)


_PLACED_GALLERY: dict = {}


def _placed_padded_gallery(gallery, mesh, axis: str):
    """Pad ``gallery`` to a device-divisible row count and place it
    ``P(axis, None)`` on the mesh — cached per gallery ARRAY.

    Serving calls :func:`sharded_sim_topk` with the same committed array
    on every request (it changes only on add/compact), so the pad copy +
    host-of-the-committed-device scatter must happen once, not per query.
    Keyed by ``id`` with an identity re-check, evicted by a weakref
    callback when the gallery array is collected (jax arrays are not
    hashable, so no WeakKeyDictionary); the cache then never outlives the
    one padded+sharded copy per LIVE gallery."""
    import weakref

    key = id(gallery)
    ent = _PLACED_GALLERY.get(key)
    if (ent is not None and ent[0]() is gallery and ent[1] is mesh
            and ent[2] == axis):
        return ent[3]
    g_pad, _ = _pad_rows(gallery, mesh.shape[axis])
    (g_pad,) = _on_mesh(mesh, (g_pad, P(axis, None)))
    if g_pad is gallery:
        # already divisible AND already sharded as required: pad and
        # device_put were both identity no-ops, so there is nothing to
        # amortize — and caching would store a STRONG ref to the gallery
        # in its own entry, defeating the weakref eviction and pinning
        # every swapped-out gallery for process lifetime (review r5)
        return g_pad
    _PLACED_GALLERY[key] = (
        weakref.ref(gallery, lambda _r, _k=key: _PLACED_GALLERY.pop(_k, None)),
        mesh, axis, g_pad)
    return g_pad


@lru_cache(maxsize=None)
def _sim_topk_program(mesh, axis: str, k: int, stream: bool):
    """Compiled-program cache for :func:`sharded_sim_topk` (same contract
    as :func:`_ranks_program`: holding the jitted object alive across
    serving requests is what lets them reuse the executable). The key is
    intentionally free of any row count — the entry point folds n and the
    caller tombstones into the eager [npad] mask, so two gallery sizes
    sharing a padded shape share one program."""
    rep = NamedSharding(mesh, P())

    def fn(q, g_pad, gallery_valid):
        return _sharded_sim_topk_impl(q, g_pad, mesh, axis, k,
                                      gallery_valid, stream)

    return jax.jit(fn, out_shardings=(rep, rep))


def _sharded_sim_topk_impl(queries, g_pad, mesh, axis, k, gallery_valid,
                           stream):
    """Traced body of :func:`sharded_sim_topk` (always runs under the
    cached jit of :func:`_sim_topk_program`); ``g_pad`` arrives padded
    and ``P(axis, None)``-sharded from :func:`_placed_padded_gallery`,
    ``gallery_valid`` as the eager [npad] padding+tombstone mask."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(axis, None), P(axis)),
        out_specs=(P(None), P(None)),
        # after the all_gather the candidates are replicated across the axis,
        # but the varying-mesh-axes checker can't infer that statically.
        # Replication is asserted dynamically instead: the same body runs
        # with per-device outputs in tests/test_sharded_eval.py.
        check_vma=False,
    )
    def _topk(q, g_shard, gvalid_shard):
        return _sim_topk_body(q, g_shard, gvalid_shard, axis=axis, k=k,
                              streaming=stream)

    return _topk(*_on_mesh(mesh, (queries, P(None, None)),
                           (g_pad, P(axis, None)), (gallery_valid, P(axis))))


def prepare_sharded_topk_gallery(
    gallery: Array,
    mesh: Mesh,
    axis: str = "data",
    valid: Array | None = None,
    quantize: bool = False,
) -> tuple:
    """Per-shard ``prepare_topk_gallery`` under ``shard_map`` — the sharded
    serving analogue of the single-chip encode-once/prepare-once path.

    Each device pads, equalize-chunks (and optionally int8-quantizes) ITS
    gallery shard once; repeated :func:`sharded_sim_topk_prepared` calls
    then skip all per-call gallery prep. Returns
    ``(prepared, shard_rows)``: a :class:`PreparedGallery` pytree whose
    leaves carry a leading device-shard dimension (sharded over ``axis``),
    and the per-shard row count needed to map shard-local indices back to
    global gallery rows.
    """
    from cmhse_tpu.ops.topk import prepare_topk_gallery

    ndev = mesh.shape[axis]
    g_pad, gallery_valid, npad = _pad_gallery_valid(gallery, ndev, valid)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(axis),
    )
    def _prep(g_shard, v_shard):
        p = prepare_topk_gallery(g_shard, v_shard, quantize=quantize)
        # leading per-device axis so out_specs=P(axis) concatenates shards
        return jax.tree.map(lambda a: a[None], p)

    return _prep(*_on_mesh(mesh, (g_pad, P(axis, None)),
                           (gallery_valid, P(axis)))), npad // ndev


def sharded_sim_topk_prepared(
    queries: Array,
    prepared,
    k: int,
    mesh: Mesh,
    shard_rows: int,
    axis: str = "data",
    quantized: bool = False,
    rescore_m: int | None = None,
) -> tuple[Array, Array]:
    """Serving top-k against a gallery prepared per-shard by
    :func:`prepare_sharded_topk_gallery`.

    Same candidate protocol as :func:`sharded_sim_topk` (per-device local
    top-k, ``all_gather`` of k candidates per shard over ICI, final merge),
    but each device runs the streaming scan over its PRE-CHUNKED shard —
    or, with ``quantized=True`` (requires ``quantize=True`` at prepare
    time), the two-stage int8 path (:func:`cmhse_tpu.ops.topk.
    quantized_sim_topk`). Shard-local padding rows are ``-inf``-masked and
    cannot surface (the caller clamps ``k`` to the valid row count), so
    their out-of-shard global indices are never returned.

    Program-cached per (mesh, axis, k, shard_rows, quantized, rescore_m)
    like :func:`sharded_sim_topk` — this is the per-request mesh serving
    path. The prepared leaves route through ``_on_mesh`` too (CLAUDE.md's
    shard_map entry-point invariant): a no-op for the pytree
    :func:`prepare_sharded_topk_gallery` just produced, but a prepared
    gallery that round-tripped through a host copy or snapshot arrives
    single-device-committed and would otherwise crash shard_map.
    """
    program = _sim_topk_prepared_program(
        mesh, axis, k, shard_rows, quantized,
        None if rescore_m is None else int(rescore_m))
    (queries,) = _on_mesh(mesh, (queries, P(None, None)))
    prepared = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(axis))), prepared)
    return program(queries, prepared)


@lru_cache(maxsize=None)
def _sim_topk_prepared_program(mesh, axis: str, k: int, shard_rows: int,
                               quantized: bool, rescore_m: int | None):
    """Compiled-program cache for :func:`sharded_sim_topk_prepared` (same
    contract as :func:`_ranks_program`)."""
    from cmhse_tpu.ops.topk import (PreparedGallery, quantized_sim_topk,
                                    streaming_sim_topk)

    rep = NamedSharding(mesh, P())

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(axis)),
        out_specs=(P(None), P(None)),
        check_vma=False,  # same replication argument as sharded_sim_topk
    )
    def _topk(q, prep_shard):
        # strip the leading per-device axis; tree.map preserves the
        # PreparedGallery structure (None int8 fields stay None)
        p: PreparedGallery = jax.tree.map(lambda a: a[0], prep_shard)
        capacity = p.chunks.shape[0] * p.chunks.shape[1]
        kk = min(k, capacity)
        if quantized:
            if p.int8_chunks is None:
                raise ValueError(
                    "quantized=True needs prepare_sharded_topk_gallery("
                    "..., quantize=True)")
            loc_scores, loc_idx = quantized_sim_topk(
                q, p, kk, rescore_m=rescore_m)
        else:
            loc_scores, loc_idx = streaming_sim_topk(q, p, kk)
        shard_id = jax.lax.axis_index(axis)
        glob_idx = loc_idx + shard_id * shard_rows
        return _merge_shard_candidates(loc_scores, glob_idx, axis, k)

    return jax.jit(_topk, out_shardings=(rep, rep))
