"""Device-resident gallery eval: masked sharded metrics must equal the
host-filtered single-device metrics (padded rows kept in place)."""

import numpy as np
import jax
import jax.numpy as jnp

from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
from cmhse_tpu.data import SyntheticHierarchicalDataset, batches_from_dataset
from cmhse_tpu.eval.encode import encode_data, encode_gallery_device
from cmhse_tpu.eval.retrieval import validate_metrics
from cmhse_tpu.models import CMHSE
from cmhse_tpu.ops.ranking import (
    bidirectional_metrics,
    masked_median_rank,
    masked_recall_at_k,
)
from cmhse_tpu.ops.similarity import cosine_sim
from cmhse_tpu.parallel.eval_sharded import sharded_retrieval_metrics
from cmhse_tpu.parallel.mesh import make_mesh
from cmhse_tpu.train import create_train_state


def _setup(n_videos=21):  # 21 -> last batch has 3 padded rows
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, feat_dim=12, vocab_size=64, max_clips=2,
                        max_frames=5, max_sentences=2, max_words=5),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=12,
                          rnn_hidden=16),
    )
    ds = SyntheticHierarchicalDataset(num_videos=n_videos, feat_dim=12,
                                      vocab_size=64, max_clips=2,
                                      max_frames=5, max_words=5, seed=5)
    batches = list(batches_from_dataset(ds, cfg.data, shuffle=False))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
    model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)
    return cfg, model, state, batches


def test_device_gallery_matches_host_path():
    cfg, model, state, batches = _setup()
    V, P, valid = encode_gallery_device(model, state.params, batches)
    assert V.shape[0] == 24 and int(valid.sum()) == 21

    v_host, p_host, _ = encode_data(model, state.params, batches)
    np.testing.assert_allclose(
        np.asarray(V)[np.asarray(valid)], np.asarray(v_host), rtol=1e-5,
        atol=1e-6,
    )


def test_masked_sharded_metrics_match_host_filtered():
    cfg, model, state, batches = _setup()
    mesh = make_mesh((-1,), ("data",))
    V, P, valid = encode_gallery_device(model, state.params, batches)
    got = sharded_retrieval_metrics(V, P, mesh, ks=(1, 5), valid=valid)

    v_host, p_host, _ = encode_data(model, state.params, batches)
    want = bidirectional_metrics(cosine_sim(v_host, p_host), ks=(1, 5))
    for k in want:
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=1e-5,
            err_msg=f"metric {k} diverged",
        )


def test_masked_sharded_metrics_gallery_mode():
    cfg, model, state, batches = _setup()
    mesh = make_mesh((-1,), ("data",))
    V, P, valid = encode_gallery_device(model, state.params, batches)
    got = sharded_retrieval_metrics(V, P, mesh, ks=(1, 5), mode="gallery",
                                    valid=valid)
    v_host, p_host, _ = encode_data(model, state.params, batches)
    want = bidirectional_metrics(cosine_sim(v_host, p_host), ks=(1, 5))
    for k in want:
        np.testing.assert_allclose(float(got[k]), float(want[k]), rtol=1e-5)


def test_validate_metrics_mesh_equals_no_mesh():
    cfg, model, state, batches_list = _setup()
    mesh = make_mesh((-1,), ("data",))
    m1 = validate_metrics(model, state.params,
                          iter(batches_list), ks=(1, 5))
    m2 = validate_metrics(model, state.params,
                          iter(batches_list), ks=(1, 5), mesh=mesh)
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-5, err_msg=k)


def test_masked_helpers():
    ranks = jnp.asarray(np.array([1, 2, 3, 99, 98], np.int32))
    valid = jnp.asarray(np.array([True, True, True, False, False]))
    np.testing.assert_allclose(
        float(masked_recall_at_k(ranks, 2, valid)), 2 / 3, rtol=1e-6
    )
    np.testing.assert_allclose(float(masked_median_rank(ranks, valid)), 2.0)
    # even count: numpy midpoint convention
    valid4 = jnp.asarray(np.array([True, True, True, True, False]))
    np.testing.assert_allclose(
        float(masked_median_rank(ranks, valid4)),
        float(np.median([1, 2, 3, 99])),
    )
