"""Regression pins for bugs found while driving the framework end-to-end.

1. l2norm backward NaN on exactly-zero rows (padded clip/sentence slots at
   init, where the projection bias is zero) — diverged training to NaN
   within 3 steps at rnn_hidden=1024.
2. NaN positive scores must rank WORST, not first: a diverged model's
   all-NaN embeddings made every strict-greater count zero and reported
   R@1=100 / MedR=1.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cmhse_tpu.config import DataConfig, ExperimentConfig, LossConfig, ModelConfig
from cmhse_tpu.data import SyntheticHierarchicalDataset, batches_from_dataset
from cmhse_tpu.ops.pallas_sim import pallas_rank_counts
from cmhse_tpu.ops.ranking import retrieval_ranks
from cmhse_tpu.ops.similarity import l2norm
from cmhse_tpu.parallel.eval_sharded import sharded_ranks
from cmhse_tpu.parallel.mesh import make_mesh
from cmhse_tpu.train import create_train_state, train_step


def test_l2norm_gradient_finite_on_zero_rows():
    x = jnp.asarray(np.array([[0.0, 0.0, 0.0], [3.0, 4.0, 0.0]], np.float32))

    def f(x):
        return jnp.sum(l2norm(x) * jnp.asarray([[1.0, 2, 3], [4, 5, 6]]))

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all(), g
    # nonzero rows still normalize exactly
    np.testing.assert_allclose(
        np.asarray(l2norm(x))[1], np.array([0.6, 0.8, 0.0]), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(l2norm(x))[0], np.zeros(3))


def test_training_stays_finite_at_production_width():
    """The exact divergence config: rnn_hidden=1024, feat 500, projection to
    a small embed dim (zero bias at init) with padded slots present."""
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, feat_dim=500, vocab_size=1000),
        model=ModelConfig(embed_size=32, word_dim=16, rnn_hidden=1024,
                          hierarchical=True),
        loss=LossConfig(),
    )
    ds = SyntheticHierarchicalDataset(num_videos=8, feat_dim=500,
                                      vocab_size=1000, seed=0)
    b = next(iter(batches_from_dataset(ds, cfg.data, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(42), b)
    for _ in range(3):
        state, m = train_step(state, b, cfg.loss)
        assert np.isfinite(float(m["loss"])), m
        assert np.isfinite(float(m["grad_norm"])), m


def test_nan_positive_ranks_worst_dense():
    sims = jnp.asarray(np.array([[np.nan, np.nan, np.nan],
                                 [0.1, 0.9, 0.2]], np.float32))
    ranks = np.asarray(retrieval_ranks(sims))
    assert ranks[0] == 3  # NaN positive -> worst rank, not 1
    assert ranks[1] == 1  # positive (idx 1, score 0.9) beats 0.1 and 0.2


def test_nan_positive_ranks_worst_sharded():
    mesh = make_mesh((-1,), ("data",))
    n, d = 16, 8
    rng = np.random.RandomState(0)
    v = rng.randn(n, d).astype(np.float32)
    p = rng.randn(n, d).astype(np.float32)
    v[3] = np.nan
    for mode in ("query", "gallery"):
        ranks = np.asarray(
            sharded_ranks(jnp.asarray(v), jnp.asarray(p), mesh, mode=mode)
        )
        assert ranks[3] == n, (mode, ranks)


def test_recon_term_skipped_without_decoders():
    """ADVICE round 1 (medium): recon_weight>0 with reconstruction=False must
    NOT score an MSE between a placeholder and the real embeddings — the term
    is gated on the model actually having decoders."""
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.train.objective import total_loss

    data = DataConfig(batch_size=4, feat_dim=16, vocab_size=100,
                      max_clips=2, max_frames=4, max_sentences=2, max_words=4)
    ds = SyntheticHierarchicalDataset(
        num_videos=4, feat_dim=16, vocab_size=100, max_clips=2, max_frames=4,
        max_words=4, seed=0)
    b = next(iter(batches_from_dataset(ds, data, shuffle=False)))
    loss_cfg = LossConfig(recon_weight=5e-4, use_pallas=False)

    def run(reconstruction: bool):
        mcfg = ModelConfig(embed_size=8, word_dim=8, feat_dim=16,
                           rnn_hidden=8, hierarchical=True,
                           reconstruction=reconstruction)
        model = CMHSE(cfg=mcfg, vocab_size=100)
        params = model.init(jax.random.PRNGKey(0), b)["params"]
        out = model.apply({"params": params}, b)
        return total_loss(out, b, loss_cfg)

    _, metrics_off = run(False)
    assert "loss_recon" not in metrics_off  # no spurious near-constant term
    _, metrics_on = run(True)
    assert float(metrics_on["loss_recon"]) > 0.0  # real decoders still score


def test_nan_positive_ranks_worst_pallas():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    g = jnp.asarray(rng.randn(10, 8).astype(np.float32))
    pos_score = jnp.asarray(np.array([0.1, np.nan, 0.0, -5.0], np.float32))
    ranks = np.asarray(pallas_rank_counts(q, g, pos_score))
    assert ranks[1] == 10
    assert np.isfinite(ranks).all()


def test_nan_sentinel_consistent_across_dispatch_boundary():
    """The streaming/dense dispatch (should_stream) must not change a
    NaN-positive query's rank when a validity mask drops gallery rows: both
    paths use the VALID gallery size as the worst-rank sentinel (the dense
    path compacts invalid rows away before ranking)."""
    from cmhse_tpu.eval.retrieval import streaming_bidirectional_metrics
    from cmhse_tpu.ops.ranking import bidirectional_metrics
    from cmhse_tpu.ops.similarity import cosine_sim, l2norm

    rng = np.random.RandomState(0)
    n, nvalid, d = 12, 9, 8
    v = l2norm(jnp.asarray(rng.randn(n, d).astype(np.float32)))
    p = l2norm(jnp.asarray(rng.randn(n, d).astype(np.float32)))
    valid = jnp.asarray(np.arange(n) < nvalid)
    v = v.at[2].set(jnp.nan)  # one valid NaN query

    stream = streaming_bidirectional_metrics(v, p, ks=(1, 5), valid=valid)
    keep = np.asarray(valid)
    dense = bidirectional_metrics(
        cosine_sim(v[keep], p[keep]), ks=(1, 5)
    )
    for key in ("v2p_meanr", "v2p_medr", "p2v_meanr", "rsum"):
        np.testing.assert_allclose(float(stream[key]), float(dense[key]),
                                   err_msg=key)

    # sharded paths agree too (both modes, both kernels)
    mesh = make_mesh((-1,), ("data",))
    for mode in ("query", "gallery"):
        for streaming in (False, True):
            ranks = np.asarray(sharded_ranks(v, p, mesh, mode=mode,
                                             streaming=streaming,
                                             valid=valid))
            assert ranks[2] == nvalid, (mode, streaming, ranks[2])
