"""Streaming top-k parity (VERDICT r2 next-step 2): the chunked-scan
serving path must reproduce dense masked ``lax.top_k`` exactly — scores,
indices, AND tie order — at every boundary shape."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmhse_tpu.ops.topk import (prepare_topk_gallery, should_stream_topk,
                                streaming_sim_topk)


def _dense_topk(q, g, k, valid=None):
    sims = jnp.dot(q, g.T, preferred_element_type=jnp.float32)
    if valid is not None:
        sims = jnp.where(jnp.asarray(valid)[None, :], sims, -jnp.inf)
    return jax.lax.top_k(sims, k)


@pytest.mark.parametrize("n,chunk,k", [
    (100, 32, 5),     # ragged final chunk
    (64, 64, 10),     # single chunk
    (96, 32, 33),     # k > chunk (merge must keep >chunk candidates)
    (7, 32, 3),       # gallery smaller than the chunk
    (256, 32, 1),     # k=1
])
def test_streaming_matches_dense(n, chunk, k):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(9, 16).astype(np.float32))
    g = jnp.asarray(rng.randn(n, 16).astype(np.float32))
    ds, di = _dense_topk(q, g, k)
    ss, si = streaming_sim_topk(q, g, k, chunk=chunk)
    # indices exact (the semantic contract); scores within GEMM
    # reassociation noise (CPU oneDNN fuses padded/unpadded shapes apart)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds),
                               rtol=1e-4, atol=1e-5)


def test_streaming_respects_valid_mask():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(5, 8).astype(np.float32))
    g = jnp.asarray(rng.randn(50, 8).astype(np.float32))
    valid = np.ones(50, bool)
    valid[[0, 13, 31, 49]] = False  # incl. first and last rows
    ds, di = _dense_topk(q, g, 10, valid)
    ss, si = streaming_sim_topk(q, g, 10, valid=jnp.asarray(valid), chunk=16)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
    assert not (set(np.asarray(si).ravel()) & {0, 13, 31, 49})


def test_streaming_tie_order_matches_dense():
    """Exact-duplicate gallery rows: the stable dense top_k returns the
    LOWEST index first; the chunked merge must do the same even when the
    duplicates land in different chunks."""
    rng = np.random.RandomState(2)
    base = rng.randn(40, 8).astype(np.float32)
    # row 35 duplicates row 2 (different chunks at chunk=16); row 17
    # duplicates row 16 (adjacent, same chunk boundary)
    base[35] = base[2]
    base[17] = base[16]
    q = jnp.asarray(rng.randn(6, 8).astype(np.float32))
    g = jnp.asarray(base)
    ds, di = _dense_topk(q, g, 40)
    ss, si = streaming_sim_topk(q, g, 40, chunk=16)
    # indices are the semantic contract (exact, incl. tie order); scores may
    # differ 1 ulp between the two compiled GEMMs (CPU oneDNN reassociation)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds),
                               rtol=1e-6, atol=1e-6)


def test_grouped_preselect_matches_dense():
    """Chunks wide enough for the grouped pre-select (ngroups >= 2k) must
    still be exact: group-max selection provably covers the dense top-k,
    and ascending re-sort of selected groups preserves tie order."""
    rng = np.random.RandomState(5)
    n, k = 5000, 8  # chunk 5000 -> 40 groups of 128 > 2k: grouped path
    base = rng.randn(n, 16).astype(np.float32)
    # duplicates: same group (40,41), cross-group (100, 3000), and a
    # triplicate spanning group boundaries (255, 256, 257)
    base[41] = base[40]
    base[3000] = base[100]
    base[256] = base[255]
    base[257] = base[255]
    q = jnp.asarray(rng.randn(7, 16).astype(np.float32))
    g = jnp.asarray(base)
    ds, di = _dense_topk(q, g, k)
    ss, si = streaming_sim_topk(q, g, k, chunk=8192)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds),
                               rtol=1e-6, atol=1e-6)


def test_grouped_preselect_with_valid_mask_and_ragged_groups():
    """Grouped path with a chunk that is not a multiple of the group width
    (column padding) and a validity mask killing whole stretches."""
    rng = np.random.RandomState(6)
    n, k = 4000, 5  # ngroups = ceil(4000/128) = 32 > 2k
    q = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    g = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    valid = np.ones(n, bool)
    valid[:256] = False          # two whole leading groups dead
    valid[3900:] = False         # the ragged tail group dead
    ds, di = _dense_topk(q, g, k, valid)
    ss, si = streaming_sim_topk(q, g, k, valid=jnp.asarray(valid),
                                chunk=8192)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
    assert np.asarray(si).max() < 3900 and np.asarray(si).min() >= 256


def test_k_equals_capacity():
    """k == the padded gallery capacity with MORE than one chunk: the old
    fast-path condition (`n_chunks * kk == k`) skipped the global merge and
    returned per-chunk candidates concatenated (review catch). Results must
    be globally desc-sorted and dense-identical."""
    rng = np.random.RandomState(9)
    n = 256
    q = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    g = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    ds, di = _dense_topk(q, g, n)
    ss, si = streaming_sim_topk(q, g, n, chunk=128)  # 2 chunks, kk=128
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
    assert (np.diff(np.asarray(ss), axis=1) <= 0).all()  # globally sorted


def test_prepared_gallery_matches_per_call():
    """prepare_topk_gallery (the encode-once/serve-forever path) must give
    bit-identical indices to the per-call path, with and without a validity
    mask, across the grouped and plain chunk widths."""
    rng = np.random.RandomState(8)
    n, k = 4600, 6
    q = jnp.asarray(rng.randn(5, 8).astype(np.float32))
    g = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    valid = np.ones(n, bool)
    valid[::13] = False
    for chunk in (512, 4096):
        ds, di = streaming_sim_topk(q, g, k, valid=jnp.asarray(valid),
                                    chunk=chunk)
        prep = prepare_topk_gallery(g, jnp.asarray(valid), chunk=chunk)
        ps, pi = streaming_sim_topk(q, prep, k)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(di))
        np.testing.assert_allclose(np.asarray(ps), np.asarray(ds),
                                   rtol=1e-5, atol=1e-6)
        # off-TPU the chunks keep the source dtype (true-f32 CPU dot parity)
        import jax as _jax

        if _jax.devices()[0].platform != "tpu":
            assert prep.chunks.dtype == g.dtype


def test_should_stream_topk_policy():
    from cmhse_tpu.ops.pallas_sim import STREAMING_GALLERY_MIN

    assert not should_stream_topk(STREAMING_GALLERY_MIN - 1)
    assert should_stream_topk(STREAMING_GALLERY_MIN)
    assert should_stream_topk(8, force=True)
    assert not should_stream_topk(10**9, force=False)


def test_retriever_streaming_dispatch_matches_dense(monkeypatch):
    """Force the serving dispatch onto the streaming path and pin identical
    results to the dense path on the same Retriever."""
    from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
    from cmhse_tpu.data import (SyntheticHierarchicalDataset,
                                batches_from_dataset)
    from cmhse_tpu.eval import serve as serve_mod
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.train import create_train_state

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, feat_dim=8, vocab_size=64, max_clips=2,
                        max_frames=4, max_sentences=2, max_words=4),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=8,
                          rnn_hidden=16),
    )
    ds = SyntheticHierarchicalDataset(num_videos=12, feat_dim=8,
                                      vocab_size=64, max_clips=2,
                                      max_frames=4, max_words=4)
    batches = list(batches_from_dataset(ds, cfg.data, shuffle=False))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
    model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)

    r = serve_mod.Retriever(model, state.params)
    r.build_gallery(batches)
    b = batches[0]
    dense_s, dense_i = r.retrieve(b.words, b.word_len, b.sent_len, k=7)

    monkeypatch.setattr(serve_mod, "should_stream_topk",
                        lambda n, force=None: True)
    stream_s, stream_i = r.retrieve(b.words, b.word_len, b.sent_len, k=7)
    np.testing.assert_array_equal(stream_i, dense_i)
    np.testing.assert_allclose(stream_s, dense_s, rtol=1e-6)
    # padding rows (gallery keeps them in place) never surface
    invalid = set(np.nonzero(~np.asarray(r.gallery_valid))[0])
    assert not (set(stream_i.ravel()) & invalid)


def test_sharded_topk_streaming_parity():
    """sharded_sim_topk with streaming=True (chunked scan inside each shard)
    must match the dense sharded path bit-for-bit."""
    from cmhse_tpu.parallel.eval_sharded import sharded_sim_topk
    from cmhse_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((-1,), ("data",))
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(6, 16).astype(np.float32))
    g = jnp.asarray(rng.randn(103, 16).astype(np.float32))  # N % 8 != 0
    valid = np.ones(103, bool)
    valid[[5, 102]] = False
    ds, di = sharded_sim_topk(q, g, 9, mesh, valid=jnp.asarray(valid),
                              streaming=False)
    ss, si = sharded_sim_topk(q, g, 9, mesh, valid=jnp.asarray(valid),
                              streaming=True)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds), rtol=1e-6)


# ---------------- two-stage int8 serving mode (quantized_sim_topk) --------

def _l2n(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_quantized_exact_when_pool_covers_gallery():
    """With rescore_m >= N the exact rescore sees every row, so the result
    must be bit-identical to the dense masked top-k (scores AND indices,
    ties included) — the int8 stage only ordered the candidates."""
    from cmhse_tpu.ops.topk import quantized_sim_topk

    rng = np.random.RandomState(7)
    n, k = 1000, 10
    g = jnp.asarray(_l2n(rng.randn(n, 32).astype(np.float32)))
    q = jnp.asarray(_l2n(rng.randn(16, 32).astype(np.float32)))
    g = g.at[5].set(g[9])  # exact tie across rows
    valid = np.ones(n, bool)
    valid[997:] = False
    prep = prepare_topk_gallery(g, jnp.asarray(valid), chunk=256,
                                quantize=True)
    qs, qi = quantized_sim_topk(q, prep, k, rescore_m=1024)
    ds, di = _dense_topk(q, g, k, valid)
    np.testing.assert_array_equal(np.asarray(qi), np.asarray(di))
    np.testing.assert_allclose(np.asarray(qs), np.asarray(ds), rtol=1e-6)


def test_quantized_default_pool_high_recall_exact_scores():
    """Default rescore pool on worst-case random unit vectors: indices must
    capture >= 99% of the true top-k, and every returned score must equal
    the TRUE similarity of its returned index (rescoring is exact even when
    the pre-selection is approximate)."""
    from cmhse_tpu.ops.topk import quantized_sim_topk

    rng = np.random.RandomState(8)
    n, q_n, d, k = 8192, 64, 64, 10
    g = jnp.asarray(_l2n(rng.randn(n, d).astype(np.float32)))
    q = jnp.asarray(_l2n(rng.randn(q_n, d).astype(np.float32)))
    prep = prepare_topk_gallery(g, chunk=2048, quantize=True)
    qs, qi = quantized_sim_topk(q, prep, k)
    ds, di = _dense_topk(q, g, k)
    recall = np.mean(
        (np.asarray(qi)[:, :, None] == np.asarray(di)[:, None, :]).any(2))
    assert recall >= 0.99, recall
    true_sims = np.asarray(q) @ np.asarray(g).T
    np.testing.assert_allclose(
        np.asarray(qs),
        np.take_along_axis(true_sims, np.asarray(qi), axis=1), rtol=1e-5)
    # scores descending, no duplicate indices per query
    assert (np.diff(np.asarray(qs), axis=1) <= 1e-7).all()
    for row in np.asarray(qi):
        assert len(set(row.tolist())) == k


def test_quantized_requires_quantized_prep():
    from cmhse_tpu.ops.topk import quantized_sim_topk

    g = jnp.ones((64, 8), jnp.float32)
    prep = prepare_topk_gallery(g, chunk=32)
    with pytest.raises(ValueError, match="quantize=True"):
        quantized_sim_topk(jnp.ones((2, 8), jnp.float32), prep, 4)


def test_quantized_invalid_rows_never_surface():
    from cmhse_tpu.ops.topk import quantized_sim_topk

    rng = np.random.RandomState(9)
    n = 512
    g = rng.randn(n, 16).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::3] = False  # scattered invalid rows with big scores
    g[~valid] *= 100.0
    prep = prepare_topk_gallery(jnp.asarray(g), jnp.asarray(valid),
                                chunk=128, quantize=True)
    _, qi = quantized_sim_topk(jnp.asarray(
        _l2n(rng.randn(8, 16).astype(np.float32))), prep, 16)
    assert not (set(np.asarray(qi).ravel()) & set(np.nonzero(~valid)[0]))


@pytest.mark.parametrize("n0,m", [
    (100, 10),    # fits in the tail-padding slots of the existing chunk
    (100, 300),   # spans several new chunks
    (500, 1),     # single-row ingest
    (130, 1000),  # new rows dwarf the original gallery
])
def test_append_to_prepared_matches_fresh_prepare(n0, m):
    """Incrementally-appended prepared galleries must answer top-k exactly
    like a dense top-k over the concatenated gallery — appended rows take
    indices n0..n0+m-1 and existing indices never move."""
    from cmhse_tpu.ops.topk import append_to_prepared

    rng = np.random.RandomState(n0 + m)
    q = jnp.asarray(rng.randn(6, 8).astype(np.float32))
    g0 = jnp.asarray(rng.randn(n0, 8).astype(np.float32))
    g1 = jnp.asarray(rng.randn(m, 8).astype(np.float32))
    valid0 = np.ones(n0, bool); valid0[::7] = False
    valid1 = np.ones(m, bool); valid1[::5] = False

    pg = prepare_topk_gallery(g0, jnp.asarray(valid0), chunk=128)
    pg2 = append_to_prepared(pg, g1, n_existing=n0, valid=jnp.asarray(valid1))
    assert pg2.chunks.shape[1] == pg.chunks.shape[1]  # chunk size preserved

    full_g = jnp.concatenate([g0, g1])
    full_valid = jnp.asarray(np.concatenate([valid0, valid1]))
    k = 9
    ds, di = _dense_topk(q, full_g, k, valid=full_valid)
    ss, si = streaming_sim_topk(q, pg2, k)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds),
                               rtol=1e-5, atol=1e-6)

    # a second append on top of the first (the continuous-ingest shape)
    g2 = jnp.asarray(rng.randn(40, 8).astype(np.float32))
    pg3 = append_to_prepared(pg2, g2, n_existing=n0 + m)
    full2 = jnp.concatenate([full_g, g2])
    valid2 = jnp.concatenate([full_valid, jnp.ones(40, bool)])
    ds2, di2 = _dense_topk(q, full2, k, valid=valid2)
    ss2, si2 = streaming_sim_topk(q, pg3, k)
    np.testing.assert_array_equal(np.asarray(si2), np.asarray(di2))


def test_append_to_prepared_quantized():
    """Appending to a quantize=True prepared gallery quantizes only the new
    rows; with a pool covering the whole gallery the two-stage path is exact,
    so results must equal the dense top-k over the concatenation."""
    from cmhse_tpu.ops.topk import append_to_prepared, quantized_sim_topk

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    g0 = jnp.asarray(rng.randn(200, 8).astype(np.float32))
    g1 = jnp.asarray(rng.randn(250, 8).astype(np.float32))
    pg = prepare_topk_gallery(g0, quantize=True, chunk=128)
    pg2 = append_to_prepared(pg, g1, n_existing=200)
    assert pg2.int8_chunks is not None
    assert pg2.int8_chunks.shape[:2] == pg2.chunks.shape[:2]

    full = jnp.concatenate([g0, g1])
    ds, di = _dense_topk(q, full, 5)
    capacity = pg2.chunks.shape[0] * pg2.chunks.shape[1]
    qs, qi = quantized_sim_topk(q, pg2, 5, rescore_m=capacity)
    np.testing.assert_array_equal(np.asarray(qi), np.asarray(di))


def test_append_to_prepared_validates_inputs():
    from cmhse_tpu.ops.topk import append_to_prepared

    g = jnp.ones((10, 8), jnp.float32)
    pg = prepare_topk_gallery(g)
    assert append_to_prepared(
        pg, jnp.zeros((0, 8), jnp.float32), n_existing=10) is pg
    with pytest.raises(ValueError, match="D="):
        append_to_prepared(pg, jnp.ones((2, 4), jnp.float32), n_existing=10)
    with pytest.raises(ValueError, match="n_existing"):
        append_to_prepared(pg, jnp.ones((2, 8), jnp.float32),
                           n_existing=10**6)


def test_retriever_add_to_gallery_matches_rebuild(monkeypatch):
    """Retriever.add_to_gallery (continuous ingest) must be indistinguishable
    from building the full gallery at once: same indices, scores, and keys —
    on both the dense and the (forced) streaming prepared path."""
    from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
    from cmhse_tpu.data import (SyntheticHierarchicalDataset,
                                batches_from_dataset)
    from cmhse_tpu.eval import serve as serve_mod
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.train import create_train_state

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, feat_dim=8, vocab_size=64, max_clips=2,
                        max_frames=4, max_sentences=2, max_words=4),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=8,
                          rnn_hidden=16),
    )
    ds = SyntheticHierarchicalDataset(num_videos=24, feat_dim=8,
                                      vocab_size=64, max_clips=2,
                                      max_frames=4, max_words=4)
    batches = list(batches_from_dataset(ds, cfg.data, shuffle=False))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
    model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)
    b = batches[0]

    for force_stream in (False, True):
        if force_stream:
            monkeypatch.setattr(serve_mod, "should_stream_topk",
                                lambda n, force=None: True)
        all_at_once = serve_mod.Retriever(model, state.params)
        all_at_once.build_gallery(batches)
        want_s, want_i = all_at_once.retrieve(b.words, b.word_len,
                                              b.sent_len, k=7)

        grown = serve_mod.Retriever(model, state.params)
        grown.add_to_gallery(batches[:1])   # empty: delegates to build
        grown.add_to_gallery(batches[1:2])  # incremental appends
        grown.add_to_gallery(batches[2:])
        if force_stream:
            assert grown._prepared is not None
        got_s, got_i = grown.retrieve(b.words, b.word_len, b.sent_len, k=7)
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_allclose(got_s, want_s, rtol=1e-6, atol=1e-7)
        assert grown.gallery_keys == all_at_once.gallery_keys
        assert grown.n_valid == all_at_once.n_valid
        monkeypatch.undo()


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_prepared_crud_fuzz(seed):
    """Random interleavings of append / tombstone against the prepared
    gallery must stay exactly dense-equivalent at every step (the
    composition property the per-op tests can't cover)."""
    from cmhse_tpu.ops.topk import append_to_prepared

    rng = np.random.RandomState(seed)
    d, k = 8, 6
    q = jnp.asarray(rng.randn(4, d).astype(np.float32))

    n0 = int(rng.randint(30, 200))
    rows = rng.randn(n0, d).astype(np.float32)
    alive = np.ones(n0, bool)
    pg = prepare_topk_gallery(jnp.asarray(rows), chunk=128)

    for _ in range(8):
        if rng.rand() < 0.5:
            m = int(rng.randint(1, 150))
            new = rng.randn(m, d).astype(np.float32)
            pg = append_to_prepared(pg, jnp.asarray(new),
                                    n_existing=rows.shape[0])
            rows = np.concatenate([rows, new])
            alive = np.concatenate([alive, np.ones(m, bool)])
        else:
            # tombstone a random live subset, prepared-layout style:
            # slot s < n is row s, so masking pg.valid at those slots is
            # exactly what Retriever.remove_from_gallery does
            live = np.nonzero(alive)[0]
            drop = rng.choice(live, size=min(len(live) - 1,
                                             int(rng.randint(1, 20))),
                              replace=False)
            alive[drop] = False
            n_chunks, csize = pg.valid.shape
            keep = np.ones(n_chunks * csize, bool)
            keep[drop] = False
            pg = pg._replace(valid=pg.valid & jnp.asarray(
                keep.reshape(n_chunks, csize)))

        ds, di = _dense_topk(q, jnp.asarray(rows), k,
                             valid=jnp.asarray(alive))
        ss, si = streaming_sim_topk(q, pg, k)
        np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
        np.testing.assert_allclose(np.asarray(ss), np.asarray(ds),
                                   rtol=1e-5, atol=1e-6)


def test_retriever_remove_from_gallery(monkeypatch):
    """Tombstoning: removed keys never surface again, every other item
    keeps its index and score, and the prepared (streaming/int8) forms are
    masked in place without a rebuild."""
    from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
    from cmhse_tpu.data import (SyntheticHierarchicalDataset,
                                batches_from_dataset)
    from cmhse_tpu.eval import serve as serve_mod
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.train import create_train_state

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, feat_dim=8, vocab_size=64, max_clips=2,
                        max_frames=4, max_sentences=2, max_words=4),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=8,
                          rnn_hidden=16),
    )
    ds = SyntheticHierarchicalDataset(num_videos=16, feat_dim=8,
                                      vocab_size=64, max_clips=2,
                                      max_frames=4, max_words=4)
    batches = list(batches_from_dataset(ds, cfg.data, shuffle=False))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
    model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)
    b = batches[0]

    for force_stream, quantize in ((False, False), (True, False),
                                   (True, True)):
        if force_stream:
            monkeypatch.setattr(serve_mod, "should_stream_topk",
                                lambda n, force=None: True)
        r = serve_mod.Retriever(model, state.params, quantize=quantize)
        r.build_gallery(batches)
        before_s, before_i = r.retrieve(b.words, b.word_len, b.sent_len, k=5)

        top_keys = {r.gallery_keys[int(j)] for j in before_i[:, 0]}
        prepared_before = r._prepared
        n_valid_before = r.n_valid
        removed = r.remove_from_gallery(list(top_keys) + ["no-such-key"])
        assert removed == len(top_keys)
        assert r.n_valid == n_valid_before - removed
        if prepared_before is not None:
            # masked in place, not rebuilt
            assert r._prepared.chunks is prepared_before.chunks

        after_s, after_i = r.retrieve(b.words, b.word_len, b.sent_len, k=5)
        gone = {int(j) for j in before_i[:, 0]
                if r.gallery_keys[int(j)] in top_keys}
        assert not (set(int(x) for x in after_i.ravel()) & gone)
        # survivors keep index and score: after == before with removed rows
        # dropped out of each result list
        for q in range(before_i.shape[0]):
            want = [(int(j), float(s))
                    for j, s in zip(before_i[q], before_s[q])
                    if int(j) not in gone][:5]
            got = list(zip((int(j) for j in after_i[q][:len(want)]),
                           (float(s) for s in after_s[q][:len(want)])))
            assert [g[0] for g in got] == [w[0] for w in want]
            np.testing.assert_allclose([g[1] for g in got],
                                       [w[1] for w in want], rtol=1e-6)

        assert r.remove_from_gallery(top_keys) == 0  # idempotent
        monkeypatch.undo()


def test_retriever_quantized_mode(monkeypatch):
    """Retriever(quantize=True) on a (forced) streaming gallery: results
    match the exact dense retrieval on the same gallery."""
    from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
    from cmhse_tpu.data import (SyntheticHierarchicalDataset,
                                batches_from_dataset)
    from cmhse_tpu.eval import serve as serve_mod
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.train import create_train_state

    monkeypatch.setattr(serve_mod, "should_stream_topk",
                        lambda n, force=None: True)
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, feat_dim=8, vocab_size=64, max_clips=2,
                        max_frames=4, max_sentences=2, max_words=4),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=8,
                          rnn_hidden=16),
    )
    ds = SyntheticHierarchicalDataset(num_videos=12, feat_dim=8,
                                      vocab_size=64, max_clips=2,
                                      max_frames=4, max_words=4)
    batches = list(batches_from_dataset(ds, cfg.data, shuffle=False))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
    model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)

    r = serve_mod.Retriever(model, state.params, quantize=True)
    r.build_gallery(batches)
    assert r._prepared is not None and r._prepared.int8_chunks is not None
    b = batches[0]
    qs, qi = r.retrieve(b.words, b.word_len, b.sent_len, k=7)

    # exact reference on the same gallery (tiny pool covers everything here,
    # so equality is guaranteed, not merely likely)
    sims = np.array(r.gallery @ jnp.asarray(
        model.apply({"params": state.params}, b.words, b.word_len, b.sent_len,
                    method=model.encode_text)[0]).T).T
    sims[:, ~np.asarray(r.gallery_valid)] = -np.inf
    ref_i = np.argsort(-sims, axis=1, kind="stable")[:, :7]
    np.testing.assert_array_equal(qi, ref_i)

    # a per-request k larger than the construction-time rescore_m must
    # widen the candidate pool (retrieve()'s graceful-k contract), not
    # crash the request with "rescore_m must be >= k" (review catch)
    r_small = serve_mod.Retriever(model, state.params, quantize=True,
                                  rescore_m=2)
    r_small.build_gallery(batches)
    qs2, qi2 = r_small.retrieve(b.words, b.word_len, b.sent_len, k=7)
    assert qi2.shape == (int(b.words.shape[0]), 7)
    assert (np.diff(qs2, axis=1) <= 1e-6).all()  # scores still descending


def test_round_to_bf16_bits_matches_rne():
    """The bit-level rounding helper must reproduce IEEE round-to-nearest-
    even f32->bf16 exactly (it exists because astype(bf16).astype(f32)
    inside jit is an excess-precision pair XLA elides on TPU — the helper
    is the rescore path's guarantee of parity with the exact path's
    physically-rounded query)."""
    import ml_dtypes

    from cmhse_tpu.ops.topk import _round_to_bf16_bits

    rng = np.random.RandomState(11)
    x = np.concatenate([
        rng.randn(4096).astype(np.float32) * 10.0 ** rng.randint(-20, 20, 4096),
        np.array([0.0, -0.0, 1.0, -1.0, 1e-38, -1e-38, 3.0e38], np.float32),
        # exact tie cases: halfway between two bf16 neighbors must round
        # to even mantissa
        np.array([1.00390625, 1.01171875, -1.00390625], np.float32),
    ])
    got = np.asarray(jax.jit(_round_to_bf16_bits)(jnp.asarray(x)))
    want = x.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got.view(np.uint16), want.view(np.uint16))


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6))
def test_streaming_fuzz_ties_and_masks(seed):
    """Adversarial fuzz at one compiled shape (seeds vary data, not shapes,
    to keep the 1-core compile count bounded): duplicate-heavy galleries
    with random validity masks — streaming (adaptive chunks), prepared,
    and quantized-with-covering-pool must ALL equal the stable dense
    reference, ties included."""
    from cmhse_tpu.ops.topk import quantized_sim_topk

    rng = np.random.RandomState(100 + seed)
    n, k, d = 1536, 9, 24
    # quantize coordinates so exact cross-row ties happen organically,
    # then duplicate a random 10% of rows wholesale
    g = np.round(rng.randn(n, d) * 2) / 2
    dup_src = rng.randint(0, n, n // 10)
    dup_dst = rng.randint(0, n, n // 10)
    g[dup_dst] = g[dup_src]
    g = g.astype(np.float32)
    valid = rng.rand(n) > 0.15
    q = np.round(rng.randn(7, d) * 2).astype(np.float32) / 2

    sims = q @ g.T
    sims[:, ~valid] = -np.inf
    ref_i = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    ref_s = np.take_along_axis(sims, ref_i, axis=1)

    gj, vj, qj = jnp.asarray(g), jnp.asarray(valid), jnp.asarray(q)
    ss, si = streaming_sim_topk(qj, gj, k, valid=vj)  # adaptive chunk=None
    np.testing.assert_array_equal(np.asarray(si), ref_i)
    np.testing.assert_allclose(np.asarray(ss), ref_s, rtol=1e-6, atol=1e-6)

    prep = prepare_topk_gallery(gj, vj, quantize=True)
    ps, pi = streaming_sim_topk(qj, prep, k)
    np.testing.assert_array_equal(np.asarray(pi), ref_i)
    qs_, qi_ = quantized_sim_topk(qj, prep, k, rescore_m=n)  # covering pool
    np.testing.assert_array_equal(np.asarray(qi_), ref_i)
    np.testing.assert_allclose(np.asarray(qs_), ref_s, rtol=1e-6, atol=1e-6)


def _tiny_retriever_model():
    """A minimal (model, params) pair for Retriever tests that inject
    synthetic encoded galleries (the fuzzers bypass the encoders via
    ``encoded=`` / ``_search``, so the model only has to exist)."""
    from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
    from cmhse_tpu.data import (SyntheticHierarchicalDataset,
                                batches_from_dataset)
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.train import create_train_state

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, feat_dim=8, vocab_size=64, max_clips=2,
                        max_frames=4, max_sentences=2, max_words=4),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=8,
                          rnn_hidden=16),
    )
    ds = SyntheticHierarchicalDataset(num_videos=8, feat_dim=8, vocab_size=64,
                                      max_clips=2, max_frames=4, max_words=4)
    b = next(iter(batches_from_dataset(ds, cfg.data, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), b)
    model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)
    return model, state.params


def _synthetic_encoded(rng, n, d=16, pad=0, key_prefix="k"):
    """An ``encode_gallery_device(..., return_ids=True)``-shaped tuple with
    ``n`` valid rows and ``pad`` trailing padding rows, plus per-valid-row
    keys (exercises the key-spread path)."""
    rows = n + pad
    v = rng.randn(rows, d).astype(np.float32)
    p = rng.randn(rows, d).astype(np.float32)
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    ids = np.arange(rows)
    keys = [f"{key_prefix}{i}" for i in range(n)]
    return (jnp.asarray(v), jnp.asarray(p), valid, ids), keys, v, valid


@pytest.mark.parametrize("force_stream,quantize,mesh",
                         [(False, False, False), (True, False, False),
                          (True, True, False), (True, False, True)])
def test_retriever_compact(monkeypatch, force_stream, quantize, mesh):
    """compact() drops tombstones AND encode padding, keeps (key, score)
    results identical, returns a correct old->new row map, and rebuilds
    the prepared serving forms (dense / streaming / int8 / per-shard)."""
    from cmhse_tpu.eval import serve as serve_mod

    if force_stream:
        monkeypatch.setattr(serve_mod, "should_stream_topk",
                            lambda n, force=None: True)
    model, params = _tiny_retriever_model()
    mesh_obj = None
    if mesh:
        from cmhse_tpu.parallel.mesh import make_mesh

        mesh_obj = make_mesh((-1,), ("data",))
    rng = np.random.RandomState(0)
    encoded, keys, v, valid = _synthetic_encoded(rng, n=40, pad=8)
    r = serve_mod.Retriever(model, params, mesh=mesh_obj, quantize=quantize,
                            rescore_m=64)
    r.build_gallery(encoded=encoded, keys=keys)
    assert r.invalid_fraction == pytest.approx(8 / 48)

    gone = ["k3", "k17", "k29"]
    assert r.remove_from_gallery(gone) == 3
    q = jnp.asarray(rng.randn(5, 16).astype(np.float32))
    before_s, before_i = r._search(q, k=7)
    before = [[(r.gallery_keys[int(j)], round(float(s), 5))
               for j, s in zip(bi, bs)]
              for bi, bs in zip(before_i, before_s)]

    keys_before = list(r.gallery_keys)
    old_to_new = r.compact()
    # the map: every surviving row's key is preserved at its new position,
    # removed/padding rows map to -1
    assert old_to_new.shape == (48,)
    for old, new in enumerate(old_to_new):
        if new >= 0:
            assert r.gallery_keys[int(new)] == keys_before[old]
        else:
            assert keys_before[old] is None or keys_before[old] in gone
    assert r.n_valid == 37 and int(r.gallery.shape[0]) == 37
    assert r.invalid_fraction == 0.0
    if force_stream:
        assert r._prepared is not None
        if quantize and not mesh:
            assert r._prepared.int8_chunks is not None

    after_s, after_i = r._search(q, k=7)
    after = [[(r.gallery_keys[int(j)], round(float(s), 5))
              for j, s in zip(ai, as_)]
             for ai, as_ in zip(after_i, after_s)]
    assert after == before

    # compacting an already-dense gallery is the identity
    ident = r.compact()
    np.testing.assert_array_equal(ident, np.arange(37))

    # removal and ingest keep working on the compacted gallery
    assert r.remove_from_gallery(["k0"]) == 1
    enc2, keys2, _, _ = _synthetic_encoded(rng, n=6, key_prefix="new")
    r.add_to_gallery(encoded=enc2, keys=keys2)
    assert r.n_valid == 42
    s3, i3 = r._search(q, k=int(r.n_valid))
    got_keys = {r.gallery_keys[int(j)] for j in i3.ravel()}
    assert "k0" not in got_keys and "new0" in got_keys


@pytest.mark.parametrize("force_stream,mesh", [(False, False),
                                               (True, False), (True, True)])
def test_compaction_plan_apply_with_raced_remove(monkeypatch, force_stream,
                                                 mesh):
    """The online-compaction split: removes that land BETWEEN
    plan_compaction() and apply_compaction() (the daemon's off-lock rebuild
    window) are replayed onto the swapped-in forms — the raced key can
    never surface afterwards, and surviving (key, score) results match a
    retriever that saw the same ops inline."""
    from cmhse_tpu.eval import serve as serve_mod

    if force_stream:
        monkeypatch.setattr(serve_mod, "should_stream_topk",
                            lambda n, force=None: True)
    model, params = _tiny_retriever_model()
    mesh_obj = None
    if mesh:
        from cmhse_tpu.parallel.mesh import make_mesh

        mesh_obj = make_mesh((-1,), ("data",))
    rng = np.random.RandomState(7)
    encoded, keys, v, valid = _synthetic_encoded(rng, n=40, pad=8)
    r = serve_mod.Retriever(model, params, mesh=mesh_obj)
    r.build_gallery(encoded=encoded, keys=keys)
    assert r.remove_from_gallery(["k5", "k11"]) == 2

    plan = r.plan_compaction()
    assert not isinstance(plan, np.ndarray)
    # raced mutation: another connection tombstones k20 while the plan
    # (the expensive rebuild) is "in flight"
    assert r.remove_from_gallery(["k20"]) == 1
    old_to_new = r.apply_compaction(plan)

    # k20 exists in the new gallery (it was valid at plan time) but is
    # invalid — it must never surface; k5/k11 are gone entirely
    assert old_to_new.shape == (48,)
    new_k20 = int(old_to_new[20])
    assert new_k20 >= 0 and r.gallery_keys[new_k20] == "k20"
    assert not bool(r._host_valid()[new_k20])
    assert r.n_valid == 37  # 40 - 2 planned - 1 raced
    q = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    s, i = r._search(q, k=r.n_valid)
    got = {r.gallery_keys[int(j)] for j in i.ravel()}
    assert {"k5", "k11", "k20"}.isdisjoint(got)
    assert len(got) == 37

    # parity with the inline path on a twin retriever
    r2 = serve_mod.Retriever(model, params, mesh=mesh_obj)
    r2.build_gallery(encoded=encoded, keys=keys)
    r2.remove_from_gallery(["k5", "k11", "k20"])
    r2.compact()
    s2, i2 = r2._search(q, k=r2.n_valid)
    ref = [[(r2.gallery_keys[int(j)], round(float(x), 5))
            for j, x in zip(ri, rs)] for ri, rs in zip(i2, s2)]
    gotp = [[(r.gallery_keys[int(j)], round(float(x), 5))
             for j, x in zip(ri, rs)] for ri, rs in zip(i, s)]
    # r2 compacted k20 away entirely; the surviving (key, score) rows are
    # identical (per-row dot reductions don't depend on gallery row count)
    assert gotp == ref

    # a stale plan (gallery grew) is refused
    plan2 = r.plan_compaction()
    enc2, keys2, _, _ = _synthetic_encoded(rng, n=4, key_prefix="grow")
    r.add_to_gallery(encoded=enc2, keys=keys2)
    if not isinstance(plan2, np.ndarray):
        with pytest.raises(RuntimeError, match="stale"):
            r.apply_compaction(plan2)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_retriever_crud_fuzz_with_compaction(monkeypatch, seed):
    """Random interleavings of add / remove / COMPACT on a (forced)
    streaming Retriever must stay (key, score)-equivalent to a plain numpy
    reference at every step — the composition property VERDICT r3 item 4
    asks for (compaction closing the CRUD lifecycle)."""
    from cmhse_tpu.eval import serve as serve_mod

    monkeypatch.setattr(serve_mod, "should_stream_topk",
                        lambda n, force=None: True)
    model, params = _tiny_retriever_model()
    rng = np.random.RandomState(200 + seed)
    d, k = 16, 6
    q = jnp.asarray(rng.randn(3, d).astype(np.float32))

    r = serve_mod.Retriever(model, params)
    encoded, keys, v, valid = _synthetic_encoded(
        rng, n=int(rng.randint(20, 60)), pad=int(rng.randint(0, 5)))
    r.build_gallery(encoded=encoded, keys=keys)
    # reference: (key, vec) of live rows, in insertion order
    live = {kk: v[i] for i, kk in enumerate(keys)}
    n_added = 1

    for step in range(10):
        op = rng.rand()
        if op < 0.4:
            n_new = int(rng.randint(1, 30))
            enc, ks, vnew, _ = _synthetic_encoded(
                rng, n=n_new, pad=int(rng.randint(0, 4)),
                key_prefix=f"b{n_added}_")
            r.add_to_gallery(encoded=enc, keys=ks)
            live.update({kk: vnew[i] for i, kk in enumerate(ks)})
            n_added += 1
        elif op < 0.75 and len(live) > 3:
            drop = rng.choice(sorted(live), size=int(rng.randint(1, 4)),
                              replace=False)
            assert r.remove_from_gallery(list(drop)) == len(drop)
            for kk in drop:
                del live[kk]
        else:
            rows_before = int(r.gallery.shape[0])
            old_keys = list(r.gallery_keys)
            m = r.compact()
            assert int(r.gallery.shape[0]) == r.n_valid == len(live)
            for old, new in enumerate(m):
                if new >= 0:
                    assert r.gallery_keys[int(new)] == old_keys[old]
            assert m.shape == (rows_before,)

        # step invariant: retrieval == numpy reference by (key, score)
        names = list(live)
        ref = np.stack([live[kk] for kk in names]) if names else None
        kk_eff = min(k, len(live))
        got_s, got_i = r._search(q, kk_eff) if kk_eff else (None, None)
        if kk_eff:
            sims = np.asarray(q) @ ref.T
            order = np.argsort(-sims, axis=1, kind="stable")[:, :kk_eff]
            for row in range(q.shape[0]):
                want = [(names[j], sims[row, j]) for j in order[row]]
                got = [(r.gallery_keys[int(j)], float(s))
                       for j, s in zip(got_i[row], got_s[row])]
                assert [g[0] for g in got] == [w[0] for w in want]
                np.testing.assert_allclose([g[1] for g in got],
                                           [w[1] for w in want],
                                           rtol=1e-5, atol=1e-6)


def test_key_index_version():
    """key_index caches per (keys_version, len): same-length mutations are
    picked up when the dataset bumps its version (VERDICT r3 weak 3), and
    an unchanged dataset returns the cached map object."""
    import types

    from cmhse_tpu.eval.serve import key_index

    ds = types.SimpleNamespace(keys=["a", "b", "c"], keys_version=0)
    m1 = key_index(ds)
    assert m1 == {"a": 0, "b": 1, "c": 2}
    assert key_index(ds) is m1  # cached

    # growth invalidates via the length component (no version bump needed)
    ds.keys = ["a", "b", "c", "d"]
    assert key_index(ds)["d"] == 3

    # SAME-LENGTH mutation + version bump invalidates (the length-check
    # hole the version exists to close)
    ds.keys = ["a", "b", "x", "d"]
    ds.keys_version += 1
    m3 = key_index(ds)
    assert "x" in m3 and "c" not in m3


def test_retriever_host_valid_mirror():
    """The host validity mirror (`_valid_host`): stays in sync through
    build/remove/add/compact WITHOUT downloading the device mask, lazily
    repopulates for field-by-field assembled retrievers, and detects size
    drift from external gallery_valid replacement."""
    from cmhse_tpu.config import ModelConfig
    from cmhse_tpu.eval.serve import Retriever
    from cmhse_tpu.models import CMHSE

    n, d = 12, 8
    r = Retriever(CMHSE(cfg=ModelConfig(embed_size=d), vocab_size=16), None)
    r.gallery = jnp.asarray(np.random.default_rng(0).normal(size=(n, d)),
                            jnp.float32)
    r.gallery_valid = jnp.ones((n,), bool)
    r.n_valid, r.side = n, "video"
    r.gallery_keys = [f"v{i}" for i in range(n)]

    # BOTH host indices lazily populate on first use (field-by-field
    # assembly left them None)
    assert r._valid_host is None and r._key_rows is None
    assert r.remove_from_gallery(["v3", "v7"]) == 2
    assert r._key_rows is not None and r._key_rows["v3"] == [3]
    assert r._valid_host is not None and r._valid_host.dtype == np.bool_
    np.testing.assert_array_equal(r._valid_host,
                                  np.asarray(r.gallery_valid))

    # further mutations keep it in sync with the device mask
    assert r.remove_from_gallery(["v0", "v3"]) == 1  # v3 already dead
    np.testing.assert_array_equal(r._valid_host,
                                  np.asarray(r.gallery_valid))
    assert r.n_valid == n - 3

    old_to_new = r.compact()
    assert r._valid_host.shape == (n - 3,) and r._valid_host.all()
    np.testing.assert_array_equal(r._valid_host,
                                  np.asarray(r.gallery_valid))
    assert int((np.asarray(old_to_new) >= 0).sum()) == n - 3

    # size drift (external replacement of gallery_valid at a NEW length)
    # triggers repopulation instead of serving the stale mirror
    r.gallery = jnp.concatenate([r.gallery, r.gallery[:1] + 1.0])
    r.gallery_valid = jnp.concatenate([r.gallery_valid,
                                       jnp.zeros((1,), bool)])
    r.gallery_keys = r.gallery_keys + ["vx"]
    r._key_rows = None  # external key mutation: drop so it lazily rebuilds
    assert r.remove_from_gallery(["vx"]) == 0  # row invalid: not re-removed
    assert r._valid_host.shape[0] == n - 2
    np.testing.assert_array_equal(r._valid_host,
                                  np.asarray(r.gallery_valid))


def test_prepared_refuses_separate_valid():
    """streaming_sim_topk must REFUSE a caller validity mask alongside a
    PreparedGallery (review r5): silently discarding it masked drift
    between a Retriever's raw gallery_valid and _prepared.valid — deleted
    rows would keep surfacing with no error."""
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    g = jnp.asarray(rng.randn(64, 16).astype(np.float32))
    prep = prepare_topk_gallery(g)
    with pytest.raises(ValueError, match="validity lives"):
        streaming_sim_topk(q, prep, 5, valid=jnp.ones(64, bool))


def test_empty_gallery_prepare_and_append():
    """An EMPTY gallery prepares to a well-formed all-invalid form
    (capacity floored at one pre-select group) that append_to_prepared
    can grow — review r5: csize=0 used to ZeroDivisionError in append's
    index arithmetic."""
    from cmhse_tpu.ops.topk import append_to_prepared

    rng = np.random.RandomState(4)
    pg = prepare_topk_gallery(jnp.zeros((0, 16), jnp.float32))
    assert pg.chunks.shape[1] > 0 and not bool(pg.valid.any())
    q = jnp.asarray(rng.randn(3, 16).astype(np.float32))
    s0, _ = streaming_sim_topk(q, pg, 1)
    assert np.all(np.isneginf(np.asarray(s0)))  # nothing valid to return
    rows = jnp.asarray(rng.randn(5, 16).astype(np.float32))
    pg2 = append_to_prepared(pg, rows, n_existing=0)
    ds, di = _dense_topk(q, rows, 3)
    ss, si = streaming_sim_topk(q, pg2, 3)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds),
                               rtol=1e-4, atol=1e-5)


def test_unroll_cap_many_chunks_matches_dense():
    """A caller-forced small chunk whose count exceeds the full-unroll
    bound (n_chunks > _MAX_UNROLL -> rolled scan, review r5) stays exact
    incl. tie order."""
    from cmhse_tpu.ops.topk import _MAX_UNROLL

    rng = np.random.RandomState(5)
    n, chunk = 128 * (_MAX_UNROLL + 6), 128
    q = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    g = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    ds, di = _dense_topk(q, g, 7)
    ss, si = streaming_sim_topk(q, g, 7, chunk=chunk)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds),
                               rtol=1e-4, atol=1e-5)


def test_retrieve_clamp_does_not_recompile_per_n_valid():
    """retrieve()'s oversized-k clamp happens HOST-side: the device
    program is keyed on the gallery SIZE (moves only on add/compact), not
    on n_valid (moves on every remove) — a per-n_valid static k
    recompiled the query program under churn (review r5). Also pins the
    clamp contract: oversized k returns n_valid columns, valid rows
    only."""
    from cmhse_tpu.eval.serve import Retriever, _dense_topk

    rng = np.random.RandomState(7)
    n, d = 12, 16
    r = Retriever.__new__(Retriever)  # embedding path: no model needed
    r.model = r.params = None
    r.mesh = None
    r.quantize = False
    r.rescore_m = None
    r._prepared = None
    r._prepared_shard_rows = None
    r.side = "video"
    r.gallery = jnp.asarray(rng.randn(n, d).astype(np.float32))
    r.gallery_valid = jnp.ones(n, bool)
    r._valid_host = np.ones(n, bool)
    r.n_valid = n
    r.gallery_keys = [f"v{i}" for i in range(n)]
    r._key_rows = {k: [i] for i, k in enumerate(r.gallery_keys)}

    q_emb = jnp.asarray(rng.randn(2, d).astype(np.float32))
    r._encode_text = lambda params, w, wl, sl: q_emb
    dummy = (np.zeros((2, 1, 4), np.int32), np.zeros((2, 1), np.int32),
             np.ones(2, np.int32))

    base = _dense_topk._cache_size()
    s0, i0 = r.retrieve(*dummy, k=n)
    assert i0.shape[1] == n
    # oversized k across shrinking n_valid: SAME compiled program, and
    # only valid rows surface in exactly n_valid columns
    for drop in (1, 2, 3):
        valid = np.arange(n) < n - drop
        r.gallery_valid = jnp.asarray(valid)
        r._valid_host = valid
        r.n_valid = n - drop
        scores, idx = r.retrieve(*dummy, k=n)
        assert idx.shape[1] == n - drop
        assert np.all(idx < n - drop)
    assert _dense_topk._cache_size() == base + 1  # ONE program for all
