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


def _exact_embs(n, seed):
    """Embeddings whose pairwise similarities are EXACT in float32 under any
    reduction order: queries are one-hot rows (the dot picks a single
    element), gallery entries are quantized to a 1/64 grid. This isolates
    the rank-counting logic from backend GEMM reassociation noise (CPU
    oneDNN's [N,N] GEMM and an elementwise row dot can differ by ~5e-4;
    TPU f32 GEMMs are consistent to ~1e-7)."""
    rng = np.random.RandomState(seed)
    v = np.eye(n, dtype=np.float32)
    p = np.round(rng.randn(n, n) * 8) / 64.0
    return jnp.asarray(v), jnp.asarray(p.astype(np.float32))


@pytest.mark.parametrize("mode", ["query", "gallery"])
@pytest.mark.parametrize("n", [64, 100])
def test_sharded_ranks_streaming_bit_identical(mesh, mode, n):
    """The Pallas streaming path inside each shard (interpret mode on CPU)
    must produce the same ranks as both the dense sharded path and the
    single-device path — this pins the dispatch boundary (VERDICT item 3)."""
    v, p = _exact_embs(n, seed=4)
    single = np.asarray(retrieval_ranks(jnp.dot(v, p.T)))
    streamed = np.asarray(
        sharded_ranks(v, p, mesh, mode=mode, streaming=True)
    )
    np.testing.assert_array_equal(streamed, single)
    dense = np.asarray(sharded_ranks(v, p, mesh, mode=mode, streaming=False))
    np.testing.assert_array_equal(dense, single)


def test_sharded_ranks_streaming_nan_and_valid(mesh):
    v, p = _exact_embs(40, seed=5)
    v = v.at[7].set(jnp.nan)
    valid = jnp.asarray(np.arange(40) % 9 != 0)  # a few invalid rows
    for mode in ("query", "gallery"):
        dense = np.asarray(
            sharded_ranks(v, p, mesh, mode=mode, valid=valid, streaming=False)
        )
        streamed = np.asarray(
            sharded_ranks(v, p, mesh, mode=mode, valid=valid, streaming=True)
        )
        np.testing.assert_array_equal(streamed, dense)
    # NaN positive still worst-ranked; the sentinel is the VALID gallery
    # size (matching what the compacted dense single-device path reports),
    # not the raw row count
    assert streamed[7] == int(np.asarray(valid).sum())


def test_streaming_bidirectional_metrics_match_dense():
    from cmhse_tpu.eval.retrieval import streaming_bidirectional_metrics

    v, p = _exact_embs(100, seed=6)
    want = bidirectional_metrics(jnp.dot(v, p.T), ks=(1, 5, 10))
    got = streaming_bidirectional_metrics(v, p, ks=(1, 5, 10))
    for key in want:
        np.testing.assert_allclose(
            float(got[key]), float(want[key]), rtol=1e-6,
            err_msg=f"metric {key} diverged (streaming single-device)",
        )
    # masked variant: padding rows interleaved must not change the metrics
    valid = np.ones(110, bool)
    valid[[3, 50, 77, 90, 101, 105, 106, 107, 108, 109]] = False
    v2 = np.zeros((110, 100), np.float32)
    p2 = np.zeros((110, 100), np.float32)
    v2[valid] = np.asarray(v)
    p2[valid] = np.asarray(p)
    want2 = bidirectional_metrics(
        jnp.dot(jnp.asarray(v2[valid]), jnp.asarray(p2[valid]).T),
        ks=(1, 5, 10),
    )
    got2 = streaming_bidirectional_metrics(
        jnp.asarray(v2), jnp.asarray(p2), ks=(1, 5, 10),
        valid=jnp.asarray(valid),
    )
    for key in want2:
        np.testing.assert_allclose(
            float(got2[key]), float(want2[key]), rtol=1e-6,
            err_msg=f"metric {key} diverged (masked streaming)",
        )


def test_validate_metrics_streaming_dispatch_matches():
    """validate_metrics(streaming=True) == validate_metrics(streaming=False)
    on the same model/split — the production dispatch boundary."""
    from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
    from cmhse_tpu.data import SyntheticHierarchicalDataset, batches_from_dataset
    from cmhse_tpu.eval.retrieval import validate_metrics
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.train import create_train_state

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, feat_dim=16, vocab_size=64, max_clips=2,
                        max_frames=6, max_sentences=2, max_words=6),
        model=ModelConfig(embed_size=24, word_dim=12, feat_dim=16,
                          rnn_hidden=24, hierarchical=True),
    )
    ds = SyntheticHierarchicalDataset(num_videos=20, feat_dim=16,
                                      vocab_size=64, max_clips=2,
                                      max_frames=6, max_words=6, seed=11)
    b0 = next(iter(batches_from_dataset(ds, cfg.data, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), b0)
    model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)

    mk = lambda: batches_from_dataset(ds, cfg.data, shuffle=False)
    dense = validate_metrics(model, state.params, mk(), ks=(1, 5),
                             streaming=False)
    streamed = validate_metrics(model, state.params, mk(), ks=(1, 5),
                                streaming=True)
    for key in dense:
        np.testing.assert_allclose(
            streamed[key], dense[key], rtol=1e-6,
            err_msg=f"metric {key} diverged across the dispatch boundary",
        )


def test_return_ranks_identical_across_backends(mesh):
    """The per-query rank export (cmhse-eval --dump_ranks) must be the SAME
    vector from every backend: dense assembly, streaming single-device, and
    mesh-sharded — all with interleaved invalid rows."""
    from cmhse_tpu.eval.retrieval import streaming_bidirectional_metrics

    v, p = _exact_embs(96, seed=7)
    valid = np.ones(104, bool)
    valid[[5, 31, 64, 99, 100, 101, 102, 103]] = False
    v2 = np.zeros((104, 96), np.float32)
    p2 = np.zeros((104, 96), np.float32)
    v2[valid], p2[valid] = np.asarray(v), np.asarray(p)
    v2, p2, valid_j = jnp.asarray(v2), jnp.asarray(p2), jnp.asarray(valid)

    dense = bidirectional_metrics(jnp.dot(v, p.T), ks=(1, 5),
                                  return_ranks=True)
    stream = streaming_bidirectional_metrics(v2, p2, ks=(1, 5), valid=valid_j,
                                             return_ranks=True)
    shard = sharded_retrieval_metrics(v2, p2, mesh, ks=(1, 5), valid=valid_j,
                                      return_ranks=True)
    for key in ("v2p_ranks", "p2v_ranks"):
        want = np.asarray(dense[key])  # valid-rows-only by construction
        np.testing.assert_array_equal(np.asarray(stream[key])[valid], want)
        np.testing.assert_array_equal(np.asarray(shard[key])[valid], want)


def test_validate_metrics_return_ranks_compacted():
    """validate_metrics(return_ranks=True) returns (metrics, ranks) with the
    rank vectors compacted to exactly one entry per dataset example, equal
    across the streaming/dense dispatch boundary."""
    from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
    from cmhse_tpu.data import (SyntheticHierarchicalDataset,
                                batches_from_dataset)
    from cmhse_tpu.eval.retrieval import validate_metrics
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.train import create_train_state

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, feat_dim=16, vocab_size=64, max_clips=2,
                        max_frames=6, max_sentences=2, max_words=6),
        model=ModelConfig(embed_size=24, word_dim=12, feat_dim=16,
                          rnn_hidden=24, hierarchical=True),
    )
    # 20 % 8 != 0: the final short batch exercises the padding/compaction
    ds = SyntheticHierarchicalDataset(num_videos=20, feat_dim=16,
                                      vocab_size=64, max_clips=2,
                                      max_frames=6, max_words=6, seed=12)
    b0 = next(iter(batches_from_dataset(ds, cfg.data, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), b0)
    model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)

    mk = lambda: batches_from_dataset(ds, cfg.data, shuffle=False)
    metrics, ranks = validate_metrics(model, state.params, mk(), ks=(1, 5),
                                      streaming=False, return_ranks=True)
    assert isinstance(metrics["rsum"], float)
    assert ranks["v2p_ranks"].shape == ranks["p2v_ranks"].shape == (20,)
    assert ranks["v2p_ranks"].min() >= 1

    _, ranks_s = validate_metrics(model, state.params, mk(), ks=(1, 5),
                                  streaming=True, return_ranks=True)
    for key in ranks:
        np.testing.assert_array_equal(ranks_s[key], ranks[key])


def test_sharded_entries_accept_committed_inputs(mesh):
    """Every shard_map entry point must accept arrays COMMITTED to a single
    device (what orbax-restored params produce downstream of any jit) —
    regression for the _on_mesh placement fix; without it these raise
    'incompatible devices'."""
    from cmhse_tpu.parallel.eval_sharded import (
        prepare_sharded_topk_gallery, sharded_sim_topk_prepared)

    v, p = _embs(40, 16, seed=9)
    dev0 = jax.devices()[0]
    vc, pc = jax.device_put(v, dev0), jax.device_put(p, dev0)
    assert vc.committed and pc.committed

    for mode in ("query", "gallery"):
        np.testing.assert_array_equal(
            np.asarray(sharded_ranks(vc, pc, mesh, mode=mode)),
            np.asarray(retrieval_ranks(jnp.dot(v, p.T))))

    s, i = sharded_sim_topk(vc, pc, 5, mesh)
    want = np.argsort(-np.asarray(jnp.dot(v, p.T)), axis=1,
                      kind="stable")[:, :5]
    np.testing.assert_array_equal(np.asarray(i), want)

    prep, rows = prepare_sharded_topk_gallery(pc, mesh)
    s2, i2 = sharded_sim_topk_prepared(vc, prep, 5, mesh, shard_rows=rows)
    np.testing.assert_array_equal(np.asarray(i2), want)


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


def test_sharded_topk_output_replicated_across_devices(mesh):
    """sharded_sim_topk runs with check_vma=False (the checker can't see that
    the post-all_gather candidates are replicated). This asserts the
    replication DYNAMICALLY: the same body (`_sim_topk_body`) run with
    per-device out_specs must produce identical results on every device —
    if the body ever changes so devices disagree, the production out_specs
    P(None) would silently keep one device's answer (VERDICT round 1 weak
    item 6)."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from cmhse_tpu.parallel.eval_sharded import _pad_rows, _sim_topk_body

    rng = np.random.RandomState(4)
    k = 5
    q = jnp.asarray(rng.randn(10, 16).astype(np.float32))
    g_pad, n = _pad_rows(jnp.asarray(rng.randn(100, 16).astype(np.float32)),
                         mesh.shape["data"])
    gvalid = jnp.arange(g_pad.shape[0]) < n

    body = partial(_sim_topk_body, axis="data", k=k)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, None), P("data", None), P("data")),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    def _per_device(qq, gg, vv):
        s, i = body(qq, gg, vv)
        return s[None], i[None]  # leading device axis

    per_scores, per_idx = _per_device(q, g_pad, gvalid)
    per_scores, per_idx = np.asarray(per_scores), np.asarray(per_idx)
    ndev = mesh.shape["data"]
    assert per_scores.shape[0] == ndev
    for d in range(1, ndev):
        np.testing.assert_array_equal(per_scores[d], per_scores[0])
        np.testing.assert_array_equal(per_idx[d], per_idx[0])


def test_validate_metrics_mesh_batch_not_divisible(mesh):
    """validate_metrics' mesh path must accept batch sizes that do not
    divide the device count: eval batches are padded with invalid rows
    before batch-dim placement (regression: place_batch used to raise)."""
    from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
    from cmhse_tpu.data import SyntheticHierarchicalDataset, batches_from_dataset
    from cmhse_tpu.eval.retrieval import validate_metrics
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.train import create_train_state

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=6, feat_dim=8, vocab_size=32, max_clips=2,
                        max_frames=4, max_sentences=2, max_words=4),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=8,
                          rnn_hidden=16))
    ds = SyntheticHierarchicalDataset(num_videos=10, feat_dim=8,
                                      vocab_size=32, max_clips=2,
                                      max_frames=4, max_words=4)
    batches = list(batches_from_dataset(ds, cfg.data, shuffle=False))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
    model = CMHSE(cfg=cfg.model, vocab_size=32)
    m_mesh = validate_metrics(model, state.params, batches, mesh=mesh)
    m_single = validate_metrics(
        model, state.params,
        list(batches_from_dataset(ds, cfg.data, shuffle=False)))
    for k in m_single:
        np.testing.assert_allclose(m_mesh[k], m_single[k], rtol=1e-5,
                                   err_msg=k)


def test_sharded_prepared_topk_matches_dense():
    """Per-shard prepared galleries (prepare once, serve forever — the
    sharded serving shape): exact and quantized paths must both reproduce
    the dense global top-k on a small gallery (pool covers every shard, so
    quantized equality is guaranteed, not merely likely). N % ndev != 0."""
    from cmhse_tpu.parallel.eval_sharded import (
        prepare_sharded_topk_gallery, sharded_sim_topk_prepared)
    from cmhse_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((-1,), ("data",))
    rng = np.random.RandomState(21)
    n, k = 203, 7
    g = rng.randn(n, 16).astype(np.float32)
    valid = np.ones(n, bool)
    valid[[0, 50, 202]] = False
    g[~valid] *= 50.0  # invalid rows with huge norms must never surface
    q = jnp.asarray(rng.randn(5, 16).astype(np.float32))
    gj, vj = jnp.asarray(g), jnp.asarray(valid)

    sims = np.asarray(q) @ g.T
    sims[:, ~valid] = -np.inf
    ref_i = np.argsort(-sims, axis=1, kind="stable")[:, :k]

    for quantize in (False, True):
        prep, shard_rows = prepare_sharded_topk_gallery(
            gj, mesh, valid=vj, quantize=quantize)
        s, i = sharded_sim_topk_prepared(
            q, prep, k, mesh, shard_rows=shard_rows, quantized=quantize)
        np.testing.assert_array_equal(np.asarray(i), ref_i,
                                      err_msg=f"quantize={quantize}")
        np.testing.assert_allclose(
            np.asarray(s), np.take_along_axis(sims, ref_i, axis=1),
            rtol=1e-5, atol=1e-6)


def test_sharded_prepared_requires_quantized_prep():
    from cmhse_tpu.parallel.eval_sharded import (
        prepare_sharded_topk_gallery, sharded_sim_topk_prepared)
    from cmhse_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((-1,), ("data",))
    g = jnp.asarray(np.random.RandomState(3).randn(64, 8).astype(np.float32))
    prep, rows = prepare_sharded_topk_gallery(g, mesh)
    with pytest.raises(ValueError, match="quantize=True"):
        sharded_sim_topk_prepared(jnp.ones((2, 8), jnp.float32), prep, 3,
                                  mesh, shard_rows=rows, quantized=True)


def test_retriever_mesh_prepared_paths(monkeypatch):
    """Retriever(mesh=...) above the streaming threshold builds per-shard
    prepared galleries and serves through sharded_sim_topk_prepared — for
    both exact and quantized modes, matching the unprepared sharded path."""
    from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
    from cmhse_tpu.data import (SyntheticHierarchicalDataset,
                                batches_from_dataset)
    from cmhse_tpu.eval import serve as serve_mod
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.parallel.mesh import make_mesh
    from cmhse_tpu.train import create_train_state

    mesh = make_mesh((-1,), ("data",))
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, feat_dim=8, vocab_size=64, max_clips=2,
                        max_frames=4, max_sentences=2, max_words=4),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=8,
                          rnn_hidden=16),
    )
    ds = SyntheticHierarchicalDataset(num_videos=13, feat_dim=8,
                                      vocab_size=64, max_clips=2,
                                      max_frames=4, max_words=4)
    batches = list(batches_from_dataset(ds, cfg.data, shuffle=False))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
    model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)
    b = batches[0]

    # reference: unprepared sharded path (below threshold -> _prepared None)
    r0 = serve_mod.Retriever(model, state.params, mesh=mesh)
    r0.build_gallery(batches)
    assert r0._prepared is None
    ref_s, ref_i = r0.retrieve(b.words, b.word_len, b.sent_len, k=6)

    monkeypatch.setattr(serve_mod, "should_stream_topk",
                        lambda n, force=None: True)
    for quantize in (False, True):
        r = serve_mod.Retriever(model, state.params, mesh=mesh,
                                quantize=quantize)
        r.build_gallery(batches)
        assert r._prepared is not None
        assert (r._prepared.int8_chunks is not None) == quantize
        s, i = r.retrieve(b.words, b.word_len, b.sent_len, k=6)
        np.testing.assert_array_equal(i, ref_i, err_msg=f"q={quantize}")
        np.testing.assert_allclose(s, ref_s, rtol=1e-5, atol=1e-6)

    # continuous ingest under the mesh: add_to_gallery rebuilds the
    # per-shard prepared form and serves identically to build-at-once
    grown = serve_mod.Retriever(model, state.params, mesh=mesh)
    grown.add_to_gallery(batches[:1])
    grown.add_to_gallery(batches[1:])
    assert grown._prepared is not None
    s, i = grown.retrieve(b.words, b.word_len, b.sent_len, k=6)
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, ref_s, rtol=1e-5, atol=1e-6)

    # tombstoning under the mesh: the per-shard prepared valid mask is
    # updated in place and removed keys never surface again
    top_keys = {grown.gallery_keys[int(j)] for j in i[:, 0]}
    chunks_before = grown._prepared.chunks
    assert grown.remove_from_gallery(top_keys) == len(top_keys)
    assert grown._prepared.chunks is chunks_before  # masked, not rebuilt
    s2, i2 = grown.retrieve(b.words, b.word_len, b.sent_len, k=6)
    gone = {int(j) for j in i[:, 0]
            if grown.gallery_keys[int(j)] in top_keys}
    assert not (set(int(x) for x in i2.ravel()) & gone)


def test_sharded_topk_programs_cached(mesh):
    """Per-request mesh serving must reuse compiled programs: a repeat
    sharded_sim_topk / sharded_sim_topk_prepared call with the same
    (mesh, k, shapes) hits the lru program cache instead of building a
    fresh shard_map closure per request (review r5 — the same measured
    failure mode _ranks_program's docstring records for sharded_ranks)."""
    from cmhse_tpu.parallel.eval_sharded import (
        _sim_topk_prepared_program, _sim_topk_program,
        prepare_sharded_topk_gallery, sharded_sim_topk_prepared)

    v, p = _embs(24, 16, seed=11)
    h0 = _sim_topk_program.cache_info().hits
    s1, i1 = sharded_sim_topk(v, p, 4, mesh)
    s2, i2 = sharded_sim_topk(v, p, 4, mesh)
    assert _sim_topk_program.cache_info().hits > h0
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    prep, rows = prepare_sharded_topk_gallery(p, mesh)
    hp0 = _sim_topk_prepared_program.cache_info().hits
    sharded_sim_topk_prepared(v, prep, 4, mesh, shard_rows=rows)
    sharded_sim_topk_prepared(v, prep, 4, mesh, shard_rows=rows)
    assert _sim_topk_prepared_program.cache_info().hits > hp0


def test_prepared_pytree_committed_single_device(mesh):
    """A prepared pytree that round-tripped through the host (snapshot,
    cache restore) arrives COMMITTED to one device; the entry point must
    re-place it on the mesh instead of crashing shard_map — the CLAUDE.md
    _on_mesh invariant now applies to the prepared leaves too (review
    r5)."""
    from cmhse_tpu.parallel.eval_sharded import (
        prepare_sharded_topk_gallery, sharded_sim_topk_prepared)

    v, p = _embs(40, 16, seed=12)
    prep, rows = prepare_sharded_topk_gallery(p, mesh)
    dev0 = jax.devices()[0]
    prep_host = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a), dev0), prep)
    assert all(l.committed for l in jax.tree.leaves(prep_host))
    s, i = sharded_sim_topk_prepared(v, prep_host, 5, mesh,
                                     shard_rows=rows)
    want = np.argsort(-np.asarray(jnp.dot(v, p.T)), axis=1,
                      kind="stable")[:, :5]
    np.testing.assert_array_equal(np.asarray(i), want)


def test_sharded_gallery_placed_sharded_and_cached(mesh):
    """The serving gallery must enter the cached top-k program SHARDED
    (P(axis, None)) with its pad+scatter done ONCE per gallery array — the
    first cached-program revision fed it replicated (P()), which moved
    ndev x the data and held a full per-device gallery copy on every
    request (review r5). Odd row count exercises the pad path; results
    stay dense-identical."""
    from jax.sharding import PartitionSpec as P

    from cmhse_tpu.parallel.eval_sharded import (_PLACED_GALLERY,
                                                 _placed_padded_gallery)

    v, p = _embs(21, 16, seed=13)  # 21 % 8 != 0 -> padded to 24
    g1 = _placed_padded_gallery(p, mesh, "data")
    assert g1.sharding.spec == P("data", None)
    assert g1.shape[0] % mesh.shape["data"] == 0
    # repeat lookup: the SAME placed array (no second pad/scatter)
    assert _placed_padded_gallery(p, mesh, "data") is g1
    assert id(p) in _PLACED_GALLERY

    s, i = sharded_sim_topk(v, p, 4, mesh)
    want = np.argsort(-np.asarray(jnp.dot(v, p.T)), axis=1,
                      kind="stable")[:, :4]
    np.testing.assert_array_equal(np.asarray(i), want)

    # eviction: when the gallery array dies, the cache entry dies with it
    # (the weakref callback) — a leaked placed copy per swapped gallery
    # would defeat compaction's memory reclaim
    key = id(p)
    del p, g1
    import gc

    gc.collect()
    assert key not in _PLACED_GALLERY


def test_placed_gallery_identity_not_cached(mesh):
    """When pad AND placement are both identity no-ops (divisible rows,
    already P(axis, None)-sharded), _placed_padded_gallery must NOT cache:
    the entry would hold a strong ref to the gallery itself, its weakref
    eviction could never fire, and every swapped-out gallery would stay
    pinned for process lifetime (review r5)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cmhse_tpu.parallel.eval_sharded import (_PLACED_GALLERY,
                                                 _placed_padded_gallery)

    _, p = _embs(24, 16, seed=21)  # 24 % 8 == 0
    p = jax.device_put(p, NamedSharding(mesh, P("data", None)))
    g = _placed_padded_gallery(p, mesh, "data")
    assert g is p  # nothing to amortize
    assert id(p) not in _PLACED_GALLERY

    # and the full entry point still answers dense-identically
    v, _ = _embs(24, 16, seed=22)
    s, i = sharded_sim_topk(v, p, 4, mesh)
    want = np.argsort(-np.asarray(jnp.dot(v, p.T)), axis=1,
                      kind="stable")[:, :4]
    np.testing.assert_array_equal(np.asarray(i), want)


def test_sim_topk_program_not_keyed_on_row_count(mesh):
    """The serving program must be keyed by PADDED shape, not the exact
    row count: under continuous ingest n moves by a few rows per add
    while npad moves once per ndev rows, and keying on n compiled a
    fresh program (multi-second through the remote-compile relay) per
    ingest step and grew the program cache without bound (review r5)."""
    from cmhse_tpu.parallel.eval_sharded import _sim_topk_program

    v1, p1 = _embs(22, 16, seed=23)  # both pad to 24
    v2, p2 = _embs(23, 16, seed=24)
    sharded_sim_topk(v1, p1, 4, mesh)
    misses = _sim_topk_program.cache_info().misses
    s2, i2 = sharded_sim_topk(v2, p2, 4, mesh)
    assert _sim_topk_program.cache_info().misses == misses
    want = np.argsort(-np.asarray(jnp.dot(v2, p2.T)), axis=1,
                      kind="stable")[:, :4]
    np.testing.assert_array_equal(np.asarray(i2), want)
