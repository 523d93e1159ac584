"""Contrastive loss vs a naive O(B^2) numpy hinge loop (SURVEY.md section 4.1),
including multi-positive masking and padded-row validity."""

import numpy as np
import jax.numpy as jnp

from cmhse_tpu.ops.loss import (
    contrastive_loss,
    positive_mask_from_ids,
    reconstruction_loss,
)
from cmhse_tpu.ops.similarity import l2norm


def _naive_loss(a, b, margin, max_violation, pos_mask=None, valid=None):
    """Direct transcription of the VSE++ hinge loss, per-query mean."""
    B = a.shape[0]
    sims = a @ b.T
    if pos_mask is None:
        pos_mask = np.eye(B, dtype=bool)
    if valid is None:
        valid = np.ones(B, dtype=bool)
    total = 0.0
    for i in range(B):
        if not valid[i]:
            continue
        costs_ab, costs_ba = [], []
        for j in range(B):
            if not valid[j] or pos_mask[i, j]:
                continue
            costs_ab.append(max(0.0, margin + sims[i, j] - sims[i, i]))
        for j in range(B):
            if not valid[j] or pos_mask[j, i]:
                continue
            costs_ba.append(max(0.0, margin + sims[j, i] - sims[i, i]))
        agg = max if max_violation else sum
        total += (agg(costs_ab) if costs_ab else 0.0) + (
            agg(costs_ba) if costs_ba else 0.0
        )
    return total / max(valid.sum(), 1)


def _rand_embs(rng, B, D):
    a = rng.randn(B, D).astype(np.float32)
    b = rng.randn(B, D).astype(np.float32)
    a = np.asarray(l2norm(jnp.asarray(a)))
    b = np.asarray(l2norm(jnp.asarray(b)))
    return a, b


def test_loss_matches_naive_max_violation():
    rng = np.random.RandomState(0)
    a, b = _rand_embs(rng, 16, 8)
    got = float(contrastive_loss(jnp.asarray(a), jnp.asarray(b), margin=0.2,
                                 max_violation=True))
    want = _naive_loss(a, b, 0.2, True)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_loss_matches_naive_sum():
    rng = np.random.RandomState(1)
    a, b = _rand_embs(rng, 12, 8)
    got = float(contrastive_loss(jnp.asarray(a), jnp.asarray(b), margin=0.3,
                                 max_violation=False))
    want = _naive_loss(a, b, 0.3, False)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_loss_multi_positive_masking():
    """All positives of a query must be excluded from its negatives
    (SURVEY.md 'hard parts' item 4)."""
    rng = np.random.RandomState(2)
    a, b = _rand_embs(rng, 10, 6)
    ids = np.array([0, 0, 1, 1, 2, 2, 3, 3, 4, 4])
    pos = np.asarray(positive_mask_from_ids(jnp.asarray(ids), jnp.asarray(ids)))
    got = float(contrastive_loss(jnp.asarray(a), jnp.asarray(b), margin=0.2,
                                 max_violation=True,
                                 positive_mask=jnp.asarray(pos)))
    want = _naive_loss(a, b, 0.2, True, pos_mask=pos)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_loss_padded_rows_contribute_zero():
    rng = np.random.RandomState(3)
    a, b = _rand_embs(rng, 8, 6)
    valid = np.array([True] * 5 + [False] * 3)
    got = float(contrastive_loss(jnp.asarray(a), jnp.asarray(b), margin=0.2,
                                 max_violation=True,
                                 valid=jnp.asarray(valid)))
    want_small = _naive_loss(a[:5], b[:5], 0.2, True)
    np.testing.assert_allclose(got, want_small, rtol=1e-5)
    # and garbage in padded rows must not change the value
    a2, b2 = a.copy(), b.copy()
    a2[5:], b2[5:] = 0.33, -0.77
    got2 = float(contrastive_loss(jnp.asarray(a2), jnp.asarray(b2), margin=0.2,
                                  max_violation=True,
                                  valid=jnp.asarray(valid)))
    np.testing.assert_allclose(got2, got, rtol=1e-6)


def test_loss_gradient_flows():
    import jax
    rng = np.random.RandomState(4)
    a, b = _rand_embs(rng, 8, 6)
    g = jax.grad(lambda x: contrastive_loss(x, jnp.asarray(b)))(jnp.asarray(a))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_reconstruction_loss_masked():
    rng = np.random.RandomState(5)
    pred = rng.randn(2, 4, 3).astype(np.float32)
    tgt = rng.randn(2, 4, 3).astype(np.float32)
    mask = np.array([[1, 1, 0, 0], [1, 1, 1, 1]], bool)
    got = float(reconstruction_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                    jnp.asarray(mask)))
    err = ((pred - tgt) ** 2).sum(-1)
    want = err[mask].sum() / mask.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)
