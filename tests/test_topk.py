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
