"""Pallas kernel parity vs the jnp reference paths, interpret-mode on CPU,
over tile-edge shapes (SURVEY.md section 4.2: B not a multiple of the tile,
large D)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmhse_tpu.ops.loss import contrastive_loss, positive_mask_from_ids
from cmhse_tpu.ops.pallas_sim import (
    pallas_contrastive_loss,
    pallas_rank_counts,
)
from cmhse_tpu.ops.ranking import retrieval_ranks
from cmhse_tpu.ops.similarity import l2norm


def _embs(n, d, seed):
    rng = np.random.RandomState(seed)
    a = np.asarray(l2norm(jnp.asarray(rng.randn(n, d).astype(np.float32))))
    b = np.asarray(l2norm(jnp.asarray(rng.randn(n, d).astype(np.float32))))
    return jnp.asarray(a), jnp.asarray(b)


@pytest.mark.parametrize("bsz", [128, 130, 96])  # tile-exact, off-tile, small
def test_fused_loss_matches_jnp(bsz):
    a, b = _embs(bsz, 64, seed=0)
    want = float(contrastive_loss(a, b, margin=0.2, max_violation=True))
    got = float(pallas_contrastive_loss(a, b, margin=0.2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fused_loss_multi_positive_and_valid():
    bsz = 40
    a, b = _embs(bsz, 32, seed=1)
    ids = jnp.asarray(np.arange(bsz) // 2)
    pos = positive_mask_from_ids(ids, ids)
    valid = jnp.asarray(np.arange(bsz) < 33)
    want = float(contrastive_loss(a, b, margin=0.3, max_violation=True,
                                  positive_mask=pos, valid=valid))
    got = float(pallas_contrastive_loss(a, b, margin=0.3, positive_mask=pos,
                                        valid=valid))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("bsz", [64, 100])
def test_fused_loss_gradients_match_jnp(bsz):
    a, b = _embs(bsz, 48, seed=2)

    ga_w, gb_w = jax.grad(
        lambda x, y: contrastive_loss(x, y, margin=0.2, max_violation=True),
        argnums=(0, 1),
    )(a, b)
    ga_g, gb_g = jax.grad(
        lambda x, y: pallas_contrastive_loss(x, y, margin=0.2),
        argnums=(0, 1),
    )(a, b)
    np.testing.assert_allclose(np.asarray(ga_g), np.asarray(ga_w),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_g), np.asarray(gb_w),
                               rtol=1e-4, atol=1e-6)


def test_fused_loss_gradients_with_masks():
    bsz = 36
    a, b = _embs(bsz, 24, seed=3)
    ids = jnp.asarray(np.arange(bsz) // 3)
    pos = positive_mask_from_ids(ids, ids)
    valid = jnp.asarray(np.arange(bsz) < 30)

    ga_w, gb_w = jax.grad(
        lambda x, y: contrastive_loss(x, y, margin=0.2, max_violation=True,
                                      positive_mask=pos, valid=valid),
        argnums=(0, 1),
    )(a, b)
    ga_g, gb_g = jax.grad(
        lambda x, y: pallas_contrastive_loss(x, y, margin=0.2,
                                             positive_mask=pos, valid=valid),
        argnums=(0, 1),
    )(a, b)
    np.testing.assert_allclose(np.asarray(ga_g), np.asarray(ga_w),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_g), np.asarray(gb_w),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("q,n", [(64, 256), (50, 300)])
def test_rank_counts_matches_dense(q, n):
    rng = np.random.RandomState(4)
    queries = jnp.asarray(rng.randn(q, 32).astype(np.float32))
    gallery = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    pos_idx = jnp.asarray(rng.randint(0, n, size=q))
    sims = jnp.dot(queries, gallery.T)
    want = np.asarray(retrieval_ranks(sims, pos_idx))
    pos_score = np.asarray(
        jnp.take_along_axis(sims, pos_idx[:, None], axis=1)
    )[:, 0]
    got = np.asarray(
        pallas_rank_counts(queries, gallery, jnp.asarray(pos_score))
    )
    np.testing.assert_array_equal(got, want)


def test_rank_counts_bf16_precision_mode():
    """precision="bfloat16" (bf16 multiplies, f32 accumulate) must agree
    exactly with f32 on values where bf16 arithmetic is exact — small
    integers exercise the counting/masking logic under the low-precision
    GEMM without near-tie ambiguity."""
    rng = np.random.RandomState(7)
    q, n, d = 40, 200, 16
    queries = jnp.asarray(rng.randint(-3, 4, size=(q, d)).astype(np.float32))
    gallery = jnp.asarray(rng.randint(-3, 4, size=(n, d)).astype(np.float32))
    pos_idx = jnp.asarray(rng.randint(0, n, size=q))
    sims = jnp.dot(queries, gallery.T)
    pos_score = jnp.take_along_axis(sims, pos_idx[:, None], axis=1)[:, 0]
    want = np.asarray(retrieval_ranks(sims, pos_idx))
    got = np.asarray(pallas_rank_counts(
        queries, gallery, pos_score, pos_idx=pos_idx, precision="bfloat16",
    ))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(5))
def test_fused_loss_gradient_fuzz(seed):
    """Randomized shapes/masks: fused-kernel grads == jnp-path grads."""
    rng = np.random.RandomState(100 + seed)
    bsz = int(rng.randint(3, 70))
    d = int(rng.choice([8, 17, 64]))
    a, b = _embs(bsz, d, seed=200 + seed)
    group = rng.randint(1, 4)
    ids = jnp.asarray(np.arange(bsz) // group)
    pos = positive_mask_from_ids(ids, ids)
    valid = jnp.asarray(rng.rand(bsz) > 0.2)
    margin = float(rng.uniform(0.05, 0.5))

    ga_w, gb_w = jax.grad(
        lambda x, y: contrastive_loss(x, y, margin=margin,
                                      max_violation=True,
                                      positive_mask=pos, valid=valid),
        argnums=(0, 1),
    )(a, b)
    ga_g, gb_g = jax.grad(
        lambda x, y: pallas_contrastive_loss(x, y, margin=margin,
                                             positive_mask=pos, valid=valid),
        argnums=(0, 1),
    )(a, b)
    np.testing.assert_allclose(np.asarray(ga_g), np.asarray(ga_w),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_g), np.asarray(gb_w),
                               rtol=1e-4, atol=1e-6)


def test_rc_tiles_always_mosaic_aligned():
    """Tile sizes must stay 128-aligned for ANY embed dim: the VMEM-budget
    quotients hit odd values for d > 1536 (e.g. 1536/6 MiB splits), and
    Mosaic rejects lane/sublane-misaligned blocks ON HARDWARE ONLY
    (regression: d=4096 produced tn=192, d=1664 produced tm=945)."""
    from cmhse_tpu.ops.pallas_sim import _rc_tiles

    for q in (128, 512, 1024, 4096):
        for d in (256, 512, 1024, 1536, 1664, 2048, 3072, 4096, 8192):
            tm, tn = _rc_tiles(q, d)
            assert tm % 128 == 0 and tm >= 128, (q, d, tm)
            assert tn % 128 == 0 and tn >= 128, (q, d, tn)
