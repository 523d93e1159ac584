"""Contrastive max-of-hinges ranking loss with in-batch hard negatives.

Rebuilds SURVEY.md C7 (``ContrastiveLoss`` in the reference's ``model.py``,
VSE++ lineage): cosine-similarity matrix over the batch, hinge ranking loss
with margin alpha, and the VSE++ ``max_violation`` hardest-negative variant.

TPU-first departures from the reference:
  * supports an explicit ``positive_mask`` so that when one gallery item has
    multiple positives (e.g. several sentences of the same video at the
    clip<->sentence level) ALL positives are masked out of the negative set,
    not just the diagonal (SURVEY.md "hard parts" item 4);
  * supports a ``valid`` row mask so padded (bucketed) rows contribute exactly
    zero loss and zero gradient — the reference instead relied on dynamic
    batch shapes, which would force XLA recompiles here;
  * the whole computation is one GEMM + elementwise, fully fusible by XLA; a
    Pallas-fused version with identical semantics lives in
    ``cmhse_tpu.ops.pallas_sim``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cmhse_tpu.ops.similarity import cosine_sim


def positive_mask_from_ids(a_ids: Array, b_ids: Array) -> Array:
    """``mask[i, j] = True`` iff ``a_ids[i] == b_ids[j]`` (same group => positive).

    Use video ids (high level) or (video, clip) pair ids flattened (low level).
    Padded slots should carry a sentinel id of -1 and are treated as matching
    nothing valid — handle them via the ``valid`` argument of the loss.
    """
    return a_ids[:, None] == b_ids[None, :]


def contrastive_loss(
    emb_a: Array,
    emb_b: Array,
    margin: float = 0.2,
    max_violation: bool = True,
    positive_mask: Array | None = None,
    valid: Array | None = None,
) -> Array:
    """Bidirectional hinge ranking loss over an in-batch similarity matrix.

    Args:
      emb_a: ``[B, D]`` L2-normalized embeddings (e.g. video / clip).
      emb_b: ``[B, D]`` L2-normalized embeddings (e.g. paragraph / sentence);
        row ``i`` of ``emb_b`` is the positive of row ``i`` of ``emb_a``.
      margin: hinge margin alpha (reference default 0.2).
      max_violation: if True, use only the hardest negative per query (VSE++
        ``--max_violation``); else sum over all negatives (VSE0).
      positive_mask: optional ``[B, B]`` bool, True where (i, j) is a positive
        pair. Defaults to the identity (diagonal) like the reference.
      valid: optional ``[B]`` bool; False rows are padding and are excluded
        from both query and gallery roles.

    Returns:
      Scalar float32 loss, mean over valid queries (both directions summed,
      matching the reference's ``cost_s.sum() + cost_im.sum()`` scaled to a
      per-query mean so it is batch-size invariant under bucketing).
    """
    b = emb_a.shape[0]
    sims = cosine_sim(emb_a, emb_b)  # [B, B] f32

    if positive_mask is None:
        positive_mask = jnp.eye(b, dtype=bool)
    if valid is None:
        valid = jnp.ones((b,), dtype=bool)

    pair_valid = valid[:, None] & valid[None, :]
    pos_mask = positive_mask & pair_valid
    neg_mask = (~positive_mask) & pair_valid

    # Score of the designated positive for each row/column: the aligned pair
    # (i, i), as in the reference (diag of the sim matrix).
    diag = jnp.diagonal(sims)  # [B]

    # a->b direction: for query a_i, negatives are columns j with neg_mask.
    cost_ab = jnp.maximum(0.0, margin + sims - diag[:, None])
    cost_ab = jnp.where(neg_mask, cost_ab, 0.0)
    # b->a direction: for query b_j, negatives are rows i.
    cost_ba = jnp.maximum(0.0, margin + sims - diag[None, :])
    cost_ba = jnp.where(neg_mask, cost_ba, 0.0)

    if max_violation:
        loss_ab = jnp.max(cost_ab, axis=1)  # hardest negative per a-query
        loss_ba = jnp.max(cost_ba, axis=0)  # hardest negative per b-query
    else:
        loss_ab = jnp.sum(cost_ab, axis=1)
        loss_ba = jnp.sum(cost_ba, axis=0)

    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    total = jnp.sum(jnp.where(valid, loss_ab + loss_ba, 0.0))
    return total / n_valid


def reconstruction_loss(
    pred: Array,
    target: Array,
    mask: Array,
) -> Array:
    """Layer-wise reconstruction objective (SURVEY.md C8, paper tau term).

    Masked mean-squared error between decoder-predicted low-level embeddings
    and the (stop-gradient-free) encoder low-level embeddings.

    Args:
      pred:   ``[B, T, D]`` decoder outputs.
      target: ``[B, T, D]`` low-level embeddings to reconstruct.
      mask:   ``[B, T]`` bool validity of each low-level slot.
    """
    err = jnp.square((pred - target).astype(jnp.float32))
    err = jnp.sum(err, axis=-1)  # [B, T]
    err = jnp.where(mask, err, 0.0)
    denom = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return jnp.sum(err) / denom
