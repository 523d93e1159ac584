"""Sharded-gallery eval must be rank-identical to the single-device path
(SURVEY.md section 4 item 4: the fake-8-device CPU mesh is the TPU-world
fake backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmhse_tpu.ops.ranking import bidirectional_metrics, retrieval_ranks
from cmhse_tpu.ops.similarity import l2norm
from cmhse_tpu.parallel.mesh import make_mesh
from cmhse_tpu.parallel.eval_sharded import (
    sharded_ranks,
    sharded_retrieval_metrics,
    sharded_sim_topk,
)


def _embs(n, d, seed):
    rng = np.random.RandomState(seed)
    v = np.asarray(l2norm(jnp.asarray(rng.randn(n, d).astype(np.float32))))
    p = np.asarray(l2norm(jnp.asarray(rng.randn(n, d).astype(np.float32))))
    return jnp.asarray(v), jnp.asarray(p)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((-1,), ("data",))


@pytest.mark.parametrize("mode", ["query", "gallery"])
@pytest.mark.parametrize("n", [64, 100])  # 100: not a multiple of 8 devices
def test_sharded_ranks_bit_identical(mesh, mode, n):
    v, p = _embs(n, 32, seed=0)
    single = np.asarray(retrieval_ranks(jnp.dot(v, p.T)))
    sharded = np.asarray(sharded_ranks(v, p, mesh, mode=mode))
    np.testing.assert_array_equal(sharded, single)


@pytest.mark.parametrize("mode", ["query", "gallery"])
def test_sharded_metrics_match_single_device(mesh, mode):
    v, p = _embs(120, 16, seed=1)
    want = bidirectional_metrics(jnp.dot(v, p.T), ks=(1, 5, 10))
    got = sharded_retrieval_metrics(v, p, mesh, ks=(1, 5, 10), mode=mode)
    for key in want:
        np.testing.assert_allclose(
            float(got[key]), float(want[key]), rtol=1e-6,
            err_msg=f"metric {key} diverged in mode={mode}",
        )


def test_sharded_topk_matches_dense(mesh):
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(10, 16).astype(np.float32))
    g = jnp.asarray(rng.randn(100, 16).astype(np.float32))
    scores, idx = sharded_sim_topk(q, g, k=5, mesh=mesh)
    dense = np.asarray(jnp.dot(q, g.T))
    want_idx = np.argsort(-dense, axis=1)[:, :5]
    want_scores = np.take_along_axis(dense, want_idx, axis=1)
    np.testing.assert_allclose(np.asarray(scores), want_scores, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_sharded_topk_gallery_smaller_than_k_per_shard(mesh):
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    g = jnp.asarray(rng.randn(24, 8).astype(np.float32))  # 3 rows/shard < k=5
    scores, idx = sharded_sim_topk(q, g, k=3, mesh=mesh)
    dense = np.asarray(jnp.dot(q, g.T))
    want_idx = np.argsort(-dense, axis=1)[:, :3]
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
