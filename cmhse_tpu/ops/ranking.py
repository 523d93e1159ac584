"""On-device retrieval metrics: R@k and median rank.

Rebuilds SURVEY.md C12 (the reference's ``evaluation.py`` ``i2t``/``t2i``
numpy argsort loops) — but instead of a host-side per-query ``argsort`` the
rank of the positive is computed by *counting* strictly-greater similarities:

    rank_i = 1 + |{ j : sims[i, j] > sims[i, pos_i] }|

This is O(N^2) compares on the VPU with no sort, is exactly the argsort rank
for distinct scores, shards trivially over gallery columns (the per-shard
counts just ``psum``), and — unlike ``argsort`` — keeps working when the
gallery is streamed in tiles (see ``cmhse_tpu.parallel.eval_sharded``).

Tie-breaking: numpy ``argsort`` breaks ties by index order, so when scores tie
exactly the reference's rank depends on gallery order. We count strict
inequalities, which gives the *best* rank among tied items. With float
similarities ties occur with probability ~0, and on identical inputs+weights
the ranks match the reference exactly (SURVEY.md "hard parts" item 2).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def retrieval_ranks(sims: Array, positive_idx: Array | None = None) -> Array:
    """1-based rank of each query's positive within the gallery.

    Args:
      sims: ``[Nq, Ng]`` similarity matrix (higher = closer).
      positive_idx: ``[Nq]`` int gallery index of each query's positive.
        Defaults to ``arange(Nq)`` (aligned galleries, as in the reference).

    Returns:
      ``[Nq]`` int32 ranks, 1-based.
    """
    nq, ng = sims.shape
    if positive_idx is None:
        positive_idx = jnp.arange(nq)
    pos_score = jnp.take_along_axis(sims, positive_idx[:, None], axis=1)  # [Nq,1]
    greater = jnp.sum((sims > pos_score).astype(jnp.int32), axis=1)
    ranks = greater + 1
    # A NaN positive score compares false against everything, which would
    # report a (bogus) perfect rank — e.g. from a diverged model. Report the
    # worst rank instead so broken embeddings can never look like R@1=100.
    return jnp.where(jnp.isnan(pos_score[:, 0]), ng, ranks)


def recall_at_k(ranks: Array, k: int) -> Array:
    """Fraction of queries whose positive ranks within the top-k."""
    return jnp.mean((ranks <= k).astype(jnp.float32))


def median_rank(ranks: Array) -> Array:
    """Median of the 1-based ranks (float; midpoint for even counts), matching
    ``numpy.median`` as used by the reference's ``evaluation.py``."""
    return jnp.median(ranks.astype(jnp.float32))


def mean_rank(ranks: Array) -> Array:
    return jnp.mean(ranks.astype(jnp.float32))


def masked_recall_at_k(ranks: Array, k: int, valid: Array) -> Array:
    """R@k over valid queries only (padded gallery rows carry junk ranks)."""
    nv = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    hits = jnp.sum(jnp.where(valid, (ranks <= k).astype(jnp.float32), 0.0))
    return hits / nv


def masked_median_rank(ranks: Array, valid: Array) -> Array:
    """Median over valid entries (numpy-median midpoint convention).

    An all-invalid gallery returns NaN (matching ``np.median([])``), never a
    garbage int32-max midpoint."""
    big = jnp.where(valid, ranks, jnp.iinfo(jnp.int32).max)
    srt = jnp.sort(big).astype(jnp.float32)
    nv = jnp.sum(valid.astype(jnp.int32))
    lo = srt[jnp.maximum((nv - 1) // 2, 0)]
    hi = srt[jnp.maximum(nv // 2, 0)]
    return jnp.where(nv > 0, (lo + hi) / 2.0, jnp.nan)


def masked_mean_rank(ranks: Array, valid: Array) -> Array:
    nv = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(valid, ranks.astype(jnp.float32), 0.0)) / nv


def _metrics_from_rank_vector(ranks: Array,
                              ks: tuple[int, ...]) -> dict[str, Array]:
    out: dict[str, Array] = {f"r@{k}": recall_at_k(ranks, k) * 100.0
                             for k in ks}
    out["medr"] = median_rank(ranks)
    out["meanr"] = mean_rank(ranks)
    return out


def retrieval_metrics(
    sims: Array,
    ks: tuple[int, ...] = (1, 5, 10, 50),
    positive_idx: Array | None = None,
) -> dict[str, Array]:
    """R@k for each k, plus median and mean rank, for one query direction.

    The reference reports R@1/R@5/R@50 + MedR (paper tables); the rebuild's
    driver metric adds R@10 (BASELINE.md) — both sets fall out of ``ks``.
    """
    return _metrics_from_rank_vector(retrieval_ranks(sims, positive_idx), ks)


def bidirectional_metrics_from_ranks(
    rank_fn,
    v_emb: Array,
    p_emb: Array,
    ks: tuple[int, ...] = (1, 5, 10, 50),
    valid: Array | None = None,
    return_ranks: bool = False,
) -> dict[str, Array]:
    """Assemble the bidirectional R@k / MedR / MeanR / rsum dict from a
    rank-producing callable ``rank_fn(queries, gallery) -> [N] ranks``.

    One shared assembly for every ranking backend (dense, streaming Pallas,
    mesh-sharded) so the metric names, masked/unmasked reductions, and the
    rsum k<=10 model-selection rule cannot drift between paths.

    ``valid``: bool[N] row validity for device-resident galleries that keep
    padding rows in place; invalid rows are excluded from the reductions
    (the rank_fn is responsible for excluding them as gallery items).
    ``return_ranks``: also return the per-query 1-based rank vectors under
    ``v2p_ranks`` / ``p2v_ranks`` (full length — invalid rows carry junk;
    filter with ``valid``) for error analysis / reference diffing.
    """
    out: dict[str, Array] = {}
    for prefix, (a, b) in (
        ("v2p", (v_emb, p_emb)),
        ("p2v", (p_emb, v_emb)),
    ):
        ranks = rank_fn(a, b)
        if return_ranks:
            out[f"{prefix}_ranks"] = ranks
        if valid is None:
            for k in ks:
                out[f"{prefix}_r@{k}"] = recall_at_k(ranks, k) * 100.0
            out[f"{prefix}_medr"] = median_rank(ranks)
            out[f"{prefix}_meanr"] = mean_rank(ranks)
        else:
            for k in ks:
                out[f"{prefix}_r@{k}"] = (
                    masked_recall_at_k(ranks, k, valid) * 100.0
                )
            out[f"{prefix}_medr"] = masked_median_rank(ranks, valid)
            out[f"{prefix}_meanr"] = masked_mean_rank(ranks, valid)
    out["rsum"] = sum(
        out[f"{d}_r@{k}"] for d in ("v2p", "p2v") for k in ks if k <= 10
    )
    return out


def bidirectional_metrics(
    sims: Array,
    ks: tuple[int, ...] = (1, 5, 10, 50),
    return_ranks: bool = False,
) -> dict[str, Array]:
    """Both retrieval directions from one sim matrix (video rows, text cols).

    ``v2p_*`` uses rows as queries (video->paragraph), ``p2v_*`` columns
    (paragraph->video), mirroring the reference's ``i2t``/``t2i`` pair.
    ``rsum`` is the model-selection scalar the reference maximizes for
    best-checkpoint saving (sum of R@1/5/10 over both directions).
    ``return_ranks`` adds the per-query rank vectors (``v2p_ranks`` /
    ``p2v_ranks``), same contract as the other backends'; each direction's
    ranks are computed once and shared with the metric reductions.
    """
    ranks_v = retrieval_ranks(sims)
    ranks_p = retrieval_ranks(sims.T)
    out = {f"v2p_{k}": v
           for k, v in _metrics_from_rank_vector(ranks_v, ks).items()}
    out.update({f"p2v_{k}": v
                for k, v in _metrics_from_rank_vector(ranks_p, ks).items()})
    out["rsum"] = sum(
        out[f"{d}_r@{k}"] for d in ("v2p", "p2v") for k in ks if k <= 10
    )
    if return_ranks:
        out["v2p_ranks"] = ranks_v
        out["p2v_ranks"] = ranks_p
    return out
