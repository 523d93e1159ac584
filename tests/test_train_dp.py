"""Data-parallel train step must match single-device numerics and the
training loss must decrease (integration slice, SURVEY.md section 4.3)."""

import numpy as np
import jax
import jax.numpy as jnp

from cmhse_tpu.config import DataConfig, ExperimentConfig, LossConfig, ModelConfig
from cmhse_tpu.data import SyntheticHierarchicalDataset, batches_from_dataset
from cmhse_tpu.parallel.mesh import make_mesh
from cmhse_tpu.parallel.train_dp import place_batch, place_state
from cmhse_tpu.train import create_train_state, train_step


def _tiny_cfg(batch_size=16):
    return ExperimentConfig(
        name="tiny",
        data=DataConfig(batch_size=batch_size, feat_dim=24, vocab_size=128,
                        max_clips=3, max_frames=6, max_sentences=3, max_words=6),
        model=ModelConfig(embed_size=32, word_dim=16, feat_dim=24,
                          rnn_hidden=32, hierarchical=True),
        loss=LossConfig(),
    )


def _batches(cfg, n_videos=32):
    ds = SyntheticHierarchicalDataset(
        num_videos=n_videos, feat_dim=24, vocab_size=128,
        max_clips=3, max_frames=6, max_words=6,
    )
    return list(batches_from_dataset(ds, cfg.data, shuffle=False))


def test_dp_step_matches_single_device():
    cfg = _tiny_cfg()
    batches = _batches(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])

    # single device reference
    s1 = state
    for b in batches:
        s1, _ = train_step(s1, b, cfg.loss)

    # 8-device DP: same state replicated, same batches sharded
    mesh = make_mesh((-1,), ("data",))
    s8 = place_state(
        create_train_state(cfg, jax.random.PRNGKey(0), batches[0]), mesh
    )
    for b in batches:
        s8, _ = train_step(s8, place_batch(b, mesh), cfg.loss)

    for (k1, a), (k8, b_) in zip(
        jax.tree_util.tree_leaves_with_path(s1.params),
        jax.tree_util.tree_leaves_with_path(s8.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5,
            err_msg=f"param {k1} diverged between 1-dev and 8-dev DP",
        )


def test_dp_on_2d_mesh_with_idle_model_axis():
    """SURVEY.md section 2b: the mesh keeps a model axis so TP could be
    added WITHOUT call-site changes. Pin that claim: the same train_step /
    place_* calls must run unchanged on a 2-D (data=4, model=2) mesh — the
    batch sharded over 'data', everything replicated over the idle 'model'
    axis — and match the 1-D mesh numerics exactly."""
    cfg = _tiny_cfg()
    batches = _batches(cfg, n_videos=16)
    mesh1 = make_mesh((-1,), ("data",))
    s1 = place_state(
        create_train_state(cfg, jax.random.PRNGKey(0), batches[0]), mesh1
    )
    for b in batches:
        s1, m1 = train_step(s1, place_batch(b, mesh1), cfg.loss)

    mesh2 = make_mesh((4, 2), ("data", "model"))
    assert dict(mesh2.shape) == {"data": 4, "model": 2}
    s2 = place_state(
        create_train_state(cfg, jax.random.PRNGKey(0), batches[0]), mesh2
    )
    for b in batches:
        s2, m2 = train_step(s2, place_batch(b, mesh2), cfg.loss)

    # 4-way vs 8-way data sharding reassociates the gradient all-reduce:
    # ulp-level drift is expected, anything beyond the band is a real bug
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_loss_decreases_under_dp():
    cfg = _tiny_cfg()
    batches = _batches(cfg)
    mesh = make_mesh((-1,), ("data",))
    state = place_state(
        create_train_state(cfg, jax.random.PRNGKey(1), batches[0]), mesh
    )
    first = last = None
    for epoch in range(5):
        for b in batches:
            state, m = train_step(state, place_batch(b, mesh), cfg.loss)
            if first is None:
                first = float(m["loss"])
            last = float(m["loss"])
    assert last < first, (first, last)
