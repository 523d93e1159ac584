"""word2vec-style embedding init (SURVEY.md C5) + the serving Retriever."""

import numpy as np
import jax
import jax.numpy as jnp

from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
from cmhse_tpu.data import SyntheticHierarchicalDataset, batches_from_dataset, build_vocab
from cmhse_tpu.data.word_vectors import (
    apply_pretrained_embeddings,
    init_embedding_table,
    load_word_vectors,
)
from cmhse_tpu.eval.serve import Retriever
from cmhse_tpu.models import CMHSE
from cmhse_tpu.train import create_train_state


def test_load_word_vectors_text_and_npz(tmp_path):
    txt = tmp_path / "vecs.txt"
    txt.write_text("2 3\ncat 1.0 2.0 3.0\ndog 4.0 5.0 6.0\n")
    vecs = load_word_vectors(str(txt))
    np.testing.assert_array_equal(vecs["cat"], [1.0, 2.0, 3.0])

    npz = tmp_path / "vecs.npz"
    np.savez(npz, words=np.array(["cat", "dog"]),
             vectors=np.array([[1, 2, 3], [4, 5, 6]], np.float32))
    vecs2 = load_word_vectors(str(npz))
    np.testing.assert_array_equal(vecs2["dog"], [4.0, 5.0, 6.0])


def _write_w2v_bin(path, vecs: dict, newline_after_vector: bool = True):
    """Original word2vec C-tool binary writer (the format GoogleNews vectors
    ship in): header line, then 'word ' + dim raw float32s [+ '\\n']."""
    dim = len(next(iter(vecs.values())))
    with open(path, "wb") as f:
        f.write(f"{len(vecs)} {dim}\n".encode())
        for w, v in vecs.items():
            f.write(w.encode("utf-8") + b" ")
            f.write(np.asarray(v, "<f4").tobytes())
            if newline_after_vector:
                f.write(b"\n")


def test_load_word_vectors_c_binary(tmp_path):
    """VERDICT r2 missing 3: the .bin C-binary format must load directly."""
    src = {"cat": [1.0, 2.0, 3.0], "dog": [4.0, 5.0, 6.0],
           "naïve": [7.0, 8.0, 9.0]}
    for newline in (True, False):  # C tool writes '\n' per record; some don't
        p = tmp_path / f"vecs_{newline}.bin"
        _write_w2v_bin(p, src, newline_after_vector=newline)
        vecs = load_word_vectors(str(p))
        assert set(vecs) == set(src)
        for w, v in src.items():
            np.testing.assert_array_equal(vecs[w], np.asarray(v, np.float32))


def test_load_word_vectors_bin_truncated_raises(tmp_path):
    p = tmp_path / "trunc.bin"
    _write_w2v_bin(p, {"cat": [1.0, 2.0], "dog": [3.0, 4.0]})
    data = p.read_bytes()
    p.write_bytes(data[:-6])  # cut into dog's vector
    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated"):
        load_word_vectors(str(p))


def test_word2vec_bin_feeds_training_init(tmp_path):
    """--word2vec_path vectors.bin works end-to-end through the same
    apply_pretrained_embeddings path the train loop uses."""
    vocab = build_vocab(["alpha beta gamma"] * 2, threshold=1)
    p = tmp_path / "w2v.bin"
    _write_w2v_bin(p, {"alpha": [9.0, 9.0, 9.0], "beta": [8.0, 8.0, 8.0]})
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=4, feat_dim=8, vocab_size=len(vocab),
                        max_clips=2, max_frames=4, max_sentences=2,
                        max_words=4),
        model=ModelConfig(embed_size=16, word_dim=3, feat_dim=8,
                          rnn_hidden=16),
    )
    ds = SyntheticHierarchicalDataset(num_videos=4, feat_dim=8,
                                      vocab_size=len(vocab), max_clips=2,
                                      max_frames=4, max_words=4)
    b = next(iter(batches_from_dataset(ds, cfg.data, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), b)
    params, hits = apply_pretrained_embeddings(state.params, vocab, str(p))
    assert hits == 2
    table = np.asarray(params["word_embedding"]["embedding"])
    np.testing.assert_array_equal(table[vocab("alpha")], [9, 9, 9])


def test_init_embedding_table_hits_and_pad_zero():
    vocab = build_vocab(["the cat sat", "the dog sat"], threshold=1)
    vecs = {"cat": np.ones(4, np.float32), "dog": 2 * np.ones(4, np.float32)}
    table, hits = init_embedding_table(vocab, vecs, word_dim=4, seed=0)
    assert hits == 2
    np.testing.assert_array_equal(table[vocab("cat")], np.ones(4))
    np.testing.assert_array_equal(table[0], np.zeros(4))  # <pad> zeroed
    # unseen words keep random init (nonzero)
    assert np.abs(table[vocab("sat")]).sum() > 0


def test_apply_pretrained_embeddings_roundtrip(tmp_path):
    vocab = build_vocab(["alpha beta gamma"] * 2, threshold=1)
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=4, feat_dim=8, vocab_size=len(vocab),
                        max_clips=2, max_frames=4, max_sentences=2,
                        max_words=4),
        model=ModelConfig(embed_size=16, word_dim=3, feat_dim=8,
                          rnn_hidden=16),
    )
    ds = SyntheticHierarchicalDataset(num_videos=4, feat_dim=8,
                                      vocab_size=len(vocab), max_clips=2,
                                      max_frames=4, max_words=4)
    b = next(iter(batches_from_dataset(ds, cfg.data, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), b)

    txt = tmp_path / "w2v.txt"
    txt.write_text("alpha 9.0 9.0 9.0\nbeta 8.0 8.0 8.0\n")
    params, hits = apply_pretrained_embeddings(state.params, vocab, str(txt))
    assert hits == 2
    table = np.asarray(params["word_embedding"]["embedding"])
    np.testing.assert_array_equal(table[vocab("alpha")], [9, 9, 9])
    # model still runs with the new table
    model = CMHSE(cfg=cfg.model, vocab_size=len(vocab))
    out = model.apply({"params": params}, b)
    assert np.isfinite(np.asarray(out.para_emb)).all()


def test_retriever_device_resident_padding_masked_and_cached_jit():
    """VERDICT round 1 weak items 1/5 + next-step 7: the serving gallery must
    stay a device array (no per-batch numpy round-trip), padding rows must
    never surface in a top-k, and the text-encode program must be shared
    across Retriever instances (no per-instance recompile)."""
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

    r = Retriever(model, state.params)
    r.build_gallery(batches)
    assert isinstance(r.gallery, jax.Array)  # device-resident, not numpy
    assert r.gallery.shape[0] == 16  # padding rows kept in place...
    invalid_rows = set(np.nonzero(~np.asarray(r.gallery_valid))[0])
    assert invalid_rows == {12, 13, 14, 15}
    b = batches[0]
    _, idx = r.retrieve(b.words, b.word_len, b.sent_len, k=12)
    assert not (set(idx.ravel()) & invalid_rows)  # ...but never retrieved

    from cmhse_tpu.parallel.mesh import make_mesh

    r3 = Retriever(model, state.params, mesh=make_mesh((-1,), ("data",)))
    r3.build_gallery(batches)
    _, idx3 = r3.retrieve(b.words, b.word_len, b.sent_len, k=12)
    assert not (set(idx3.ravel()) & invalid_rows)
    np.testing.assert_array_equal(idx, idx3)

    # module-level jit cache: same compiled fn object across instances
    assert Retriever(model, state.params)._encode_text is r._encode_text


def test_retriever_topk_single_and_sharded():
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

    r = Retriever(model, state.params)
    r.build_gallery(batches)
    b = batches[0]
    scores, idx = r.retrieve(b.words, b.word_len, b.sent_len, k=5)
    assert scores.shape == (8, 5) and idx.shape == (8, 5)
    assert (np.diff(scores, axis=1) <= 1e-6).all()  # sorted desc

    from cmhse_tpu.parallel.mesh import make_mesh

    r2 = Retriever(model, state.params, mesh=make_mesh((-1,), ("data",)))
    r2.build_gallery(batches)
    scores2, idx2 = r2.retrieve(b.words, b.word_len, b.sent_len, k=5)
    np.testing.assert_array_equal(idx, idx2)
    np.testing.assert_allclose(scores, scores2, rtol=1e-5)


def test_retriever_video_to_paragraph_direction():
    """side="text" gallery + retrieve_video = the v2p serving direction
    (the reference evaluates both directions; SURVEY.md C12). Pinned
    against a manual dense top-k over the same embeddings."""
    from cmhse_tpu.eval.encode import encode_gallery_device

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

    r = Retriever(model, state.params)
    r.build_gallery(batches, side="text")
    b = batches[0]
    scores, idx = r.retrieve_video(b.frames, b.frame_len, b.clip_len, k=5)
    assert scores.shape == (8, 5)

    v, p, valid = encode_gallery_device(model, state.params, batches)
    sims = np.array(jnp.dot(v[:8], p.T,
                            preferred_element_type=jnp.float32))
    sims[:, ~np.asarray(valid)] = -np.inf
    want = np.argsort(-sims, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(idx, want)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="side"):
        r.build_gallery(batches, side="paragraph")


def test_prepared_gallery_uses_selected_side(monkeypatch):
    """With streaming forced, the pre-chunked gallery must hold the SELECTED
    modality — a side="text" build once pre-chunked the video embeddings and
    silently searched the wrong space (review catch)."""
    from cmhse_tpu.eval import serve as serve_mod

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

    monkeypatch.setattr(serve_mod, "should_stream_topk",
                        lambda n, force=None: True)
    for side in ("video", "text"):
        r = Retriever(model, state.params)
        r.build_gallery(batches, side=side)
        assert r._prepared is not None
        rows = int(r.gallery.shape[0])
        flat = np.asarray(r._prepared.chunks).reshape(-1, 16)[:rows]
        np.testing.assert_array_equal(flat, np.asarray(r.gallery))
        # and the streaming search returns the same hits as a fresh dense
        # retriever on the same side
        b = batches[0]
        if side == "video":
            s_stream, i_stream = r.retrieve(b.words, b.word_len, b.sent_len,
                                            k=5)
        else:
            s_stream, i_stream = r.retrieve_video(b.frames, b.frame_len,
                                                  b.clip_len, k=5)
        monkeypatch.setattr(serve_mod, "should_stream_topk",
                            lambda n, force=None: False)
        r2 = Retriever(model, state.params)
        r2.build_gallery(batches, side=side)
        if side == "video":
            s_dense, i_dense = r2.retrieve(b.words, b.word_len, b.sent_len,
                                           k=5)
        else:
            s_dense, i_dense = r2.retrieve_video(b.frames, b.frame_len,
                                                 b.clip_len, k=5)
        monkeypatch.setattr(serve_mod, "should_stream_topk",
                            lambda n, force=None: True)
        np.testing.assert_array_equal(i_stream, i_dense)


def test_retriever_compact_keys_spread_onto_valid_rows():
    """The device gallery keeps padding rows IN PLACE (possibly mid-gallery
    when a non-final batch is short); caller-supplied compact keys — one per
    real example — must map onto the VALID row positions, and a key count
    matching neither rows nor examples must be rejected."""
    import pytest as _pytest

    from cmhse_tpu.data.bucketing import BucketSpec, pad_batch

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=4, feat_dim=8, vocab_size=64, max_clips=2,
                        max_frames=4, max_sentences=2, max_words=4),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=8,
                          rnn_hidden=16),
    )
    ds = SyntheticHierarchicalDataset(num_videos=7, feat_dim=8, vocab_size=64,
                                      max_clips=2, max_frames=4, max_words=4)
    spec = BucketSpec(batch_size=4, max_clips=2, max_frames=4,
                      max_sentences=2, max_words=4, feat_dim=8)
    # batch 0 holds examples 0-2 (+1 pad row MID-gallery), batch 1 holds 3-6
    batches = [pad_batch([ds[i] for i in range(3)], spec),
               pad_batch([ds[i] for i in range(3, 7)], spec)]
    state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
    model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)

    keys = [f"vid_{i}" for i in range(7)]  # compact: one per real example
    r = Retriever(model, state.params)
    r.build_gallery(batches, keys=keys)
    valid = np.asarray(r.gallery_valid)
    assert r.gallery_keys[3] is None  # the mid-gallery pad row has no key
    assert [r.gallery_keys[i] for i in np.nonzero(valid)[0]] == keys

    with _pytest.raises(ValueError, match="keys"):
        r.build_gallery(batches, keys=keys[:5])
