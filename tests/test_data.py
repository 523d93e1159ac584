"""Data contract tests: vocab, bucketing, padding, loader (SURVEY.md C1-C3)."""

import json
import os

import numpy as np
import pytest

from cmhse_tpu.config import DataConfig
from cmhse_tpu.data import (
    PrecompDataset,
    SyntheticHierarchicalDataset,
    Vocabulary,
    batches_from_dataset,
    build_vocab,
    pad_batch,
)
from cmhse_tpu.data.bucketing import BucketSpec, pick_bucket


def test_vocab_special_token_layout():
    v = Vocabulary()
    assert v("<pad>") == 0
    assert v("<start>") == 1
    assert v("<end>") == 2
    assert v("<unk>") == 3
    assert v("never-seen-word") == 3


def test_build_vocab_threshold_and_encode():
    caps = ["a cat sits", "a cat runs", "a dog barks"] * 2
    v = build_vocab(caps, threshold=2)
    assert "cat" in v.word2idx and "a" in v.word2idx
    # 'barks' appears twice (caps x2) so it passes threshold=2
    ids = v.encode("a cat flies")
    assert ids[0] == 1 and ids[-1] == 2  # <start> ... <end>
    assert v.idx2word[ids[1]] == "a"
    assert ids[-2] == 3  # 'flies' unseen -> <unk>


def test_vocab_roundtrip_json(tmp_path):
    v = build_vocab(["hello world hello world"], threshold=1)
    path = str(tmp_path / "vocab.json")
    v.save(path)
    v2 = Vocabulary.load(path)
    assert v2.word2idx == v.word2idx
    assert v2("hello") == v("hello")


def test_pick_bucket():
    assert pick_bucket(3, (8, 16, 32)) == 8
    assert pick_bucket(9, (8, 16, 32)) == 16
    assert pick_bucket(33, (8, 16, 32)) == 32  # clamps


def test_pad_batch_shapes_and_masks():
    ds = SyntheticHierarchicalDataset(num_videos=5, feat_dim=16, max_clips=4,
                                      max_frames=10, max_words=8)
    spec = BucketSpec(batch_size=8, max_clips=4, max_frames=10,
                      max_sentences=4, max_words=8, feat_dim=16)
    batch = pad_batch([ds[i] for i in range(5)], spec)
    assert batch.frames.shape == (8, 4, 10, 16)
    assert batch.words.shape == (8, 4, 8)
    assert batch.valid.sum() == 5
    # lengths consistent with raw data
    ex0 = ds[0]
    assert batch.clip_len[0] == len(ex0.clips)
    for c, clip in enumerate(ex0.clips):
        assert batch.frame_len[0, c] == min(len(clip), 10)
        np.testing.assert_array_equal(
            batch.frames[0, c, : batch.frame_len[0, c]],
            clip[: batch.frame_len[0, c]],
        )
    # padded rows fully zero/invalid
    assert batch.clip_len[5:].sum() == 0
    assert (~batch.valid[5:]).all()
    assert (batch.video_ids[5:] == -1).all()


def test_pad_batch_truncates_overlong():
    ds = SyntheticHierarchicalDataset(num_videos=3, feat_dim=8, max_clips=6,
                                      max_frames=20, max_words=12)
    spec = BucketSpec(batch_size=4, max_clips=2, max_frames=5,
                      max_sentences=2, max_words=4, feat_dim=8)
    batch = pad_batch([ds[i] for i in range(3)], spec)
    assert batch.frames.shape == (4, 2, 5, 8)
    assert batch.frame_len.max() <= 5
    assert batch.clip_len.max() <= 2
    assert batch.word_len.max() <= 4


def test_bf16_feature_ingestion_identical_for_bf16_model():
    """feature_dtype='bfloat16' (DataConfig/BucketSpec): the frames arrive
    bf16 and a bf16-compute model must produce BIT-IDENTICAL embeddings vs
    f32 frames (the model casts inputs immediately, and f32->bf16 rounds
    once either way). This is what makes bf16 ingestion a free DMA win."""
    import jax
    import jax.numpy as jnp

    from cmhse_tpu.config import ModelConfig
    from cmhse_tpu.models import CMHSE

    ds = SyntheticHierarchicalDataset(num_videos=4, feat_dim=16, max_clips=3,
                                      max_frames=6, max_words=5)
    kw = dict(batch_size=4, max_clips=3, max_frames=6, max_sentences=3,
              max_words=5, feat_dim=16)
    b32 = pad_batch([ds[i] for i in range(4)], BucketSpec(**kw))
    b16 = pad_batch([ds[i] for i in range(4)],
                    BucketSpec(**kw, feature_dtype="bfloat16"))
    assert b16.frames.dtype == jnp.bfloat16
    assert b16.frames.nbytes == b32.frames.nbytes // 2

    mcfg = ModelConfig(embed_size=32, word_dim=8, feat_dim=16, rnn_hidden=32,
                       hierarchical=True, dtype="bfloat16")
    model = CMHSE(cfg=mcfg, vocab_size=ds.vocab_size)
    params = model.init(jax.random.PRNGKey(0), b32)["params"]
    out32 = model.apply({"params": params}, b32)
    out16 = model.apply({"params": params}, b16)
    np.testing.assert_array_equal(np.asarray(out32.video_emb, np.float32),
                                  np.asarray(out16.video_emb, np.float32))
    np.testing.assert_array_equal(np.asarray(out32.para_emb, np.float32),
                                  np.asarray(out16.para_emb, np.float32))


def test_loader_fixed_vs_bucketed_shapes():
    cfg = DataConfig(batch_size=4, feat_dim=8, vocab_size=64, max_clips=3,
                     max_frames=16, max_sentences=3, max_words=16,
                     frame_buckets=(4, 8, 16), word_buckets=(4, 8, 16))
    ds = SyntheticHierarchicalDataset(num_videos=10, feat_dim=8,
                                      vocab_size=64, max_clips=3,
                                      max_frames=16, max_words=16)
    fixed = list(batches_from_dataset(ds, cfg, shuffle=False))
    assert all(b.frames.shape == (4, 3, 16, 8) for b in fixed)
    bucketed = list(batches_from_dataset(ds, cfg, shuffle=False,
                                         fixed_shape=False))
    # bucketed shapes never exceed the fixed caps and hit bucket edges
    for b in bucketed:
        assert b.frames.shape[2] in (4, 8, 16)
        assert b.words.shape[2] in (4, 8, 16)


def test_loader_drop_last():
    cfg = DataConfig(batch_size=4, feat_dim=8, vocab_size=64, max_clips=2,
                     max_frames=8, max_sentences=2, max_words=8)
    ds = SyntheticHierarchicalDataset(num_videos=10, feat_dim=8,
                                      vocab_size=64, max_clips=2,
                                      max_frames=8, max_words=8)
    kept = list(batches_from_dataset(ds, cfg, drop_last=True, shuffle=False))
    assert len(kept) == 2
    assert all(b.valid.all() for b in kept)


def test_precomp_dataset_roundtrip(tmp_path):
    """PrecompDataset reads the documented npy+json layout and segments
    clips by timestamp."""
    data_path = str(tmp_path)
    os.makedirs(os.path.join(data_path, "features"))
    rng = np.random.RandomState(0)
    captions = {}
    for key in ("vid_a", "vid_b"):
        feats = rng.randn(20, 8).astype(np.float32)
        np.save(os.path.join(data_path, "features", f"{key}.npy"), feats)
        captions[key] = {
            "duration": 10.0,
            "timestamps": [[0.0, 5.0], [5.0, 10.0]],
            "sentences": ["a cat sits here", "the cat leaves"],
        }
    with open(os.path.join(data_path, "val_captions.json"), "w") as f:
        json.dump(captions, f)

    vocab = build_vocab([s for m in captions.values()
                         for s in m["sentences"]], threshold=1)
    ds = PrecompDataset(data_path, "val", vocab, feat_dim=8)
    assert len(ds) == 2
    ex = ds[0]
    assert len(ex.clips) == 2 and len(ex.sentences) == 2
    assert ex.clips[0].shape == (10, 8)  # first half of 20 frames
    assert ex.clips[1].shape == (10, 8)
    assert ex.sentences[0][0] == 1  # <start>


def test_vocab_loads_reference_era_pickle(tmp_path):
    """A vocab pickled by the reference's own ``vocab`` module (not
    importable here) must still load (MIGRATION.md claim)."""
    import pickle
    import sys
    import types

    mod = types.ModuleType("vocab")

    class RefVocabulary:
        def __init__(self):
            self.word2idx = {"<pad>": 0, "<start>": 1, "<end>": 2,
                             "<unk>": 3, "cat": 4}
            self.idx2word = {i: w for w, i in self.word2idx.items()}
            self.idx = 5

    RefVocabulary.__name__ = "Vocabulary"
    RefVocabulary.__qualname__ = "Vocabulary"
    RefVocabulary.__module__ = "vocab"
    mod.Vocabulary = RefVocabulary
    sys.modules["vocab"] = mod
    blob = pickle.dumps(RefVocabulary())
    del sys.modules["vocab"]

    path = tmp_path / "ref_vocab.pkl"
    path.write_bytes(blob)
    v = Vocabulary.load(str(path))
    assert v("cat") == 4
    assert v("never-seen") == 3


def test_precomp_dataset_h5_layouts(tmp_path):
    """Both HDF5 layouts load: flat dataset per key, and the challenge
    release's group-per-key with a nested 'c3d_features' dataset."""
    import h5py

    data_path = str(tmp_path)
    rng = np.random.RandomState(1)
    captions = {
        "flat_vid": {"duration": 4.0, "timestamps": [[0.0, 4.0]],
                     "sentences": ["a thing happens"]},
        "group_vid": {"duration": 4.0, "timestamps": [[0.0, 2.0], [2.0, 4.0]],
                      "sentences": ["first part", "second part"]},
    }
    with open(os.path.join(data_path, "val_captions.json"), "w") as f:
        json.dump(captions, f)
    with h5py.File(os.path.join(data_path, "val_features.h5"), "w") as f:
        f.create_dataset("flat_vid", data=rng.randn(8, 6).astype(np.float32))
        g = f.create_group("group_vid")
        g.create_dataset("c3d_features",
                         data=rng.randn(12, 6).astype(np.float32))

    vocab = build_vocab([s for m in captions.values()
                         for s in m["sentences"]], threshold=1)
    ds = PrecompDataset(data_path, "val", vocab, feat_dim=6)
    ex_flat = ds[ds.keys.index("flat_vid")]
    ex_group = ds[ds.keys.index("group_vid")]
    assert ex_flat.clips[0].shape == (8, 6)
    assert len(ex_group.clips) == 2
    assert ex_group.clips[0].shape == (6, 6)
    assert ds.max_frame_len(ds.keys.index("group_vid")) == 6


def test_group_by_length_batches_stay_aligned_with_remainder():
    """Regression: with len(dataset) % batch_size != 0 the short group can
    land mid-stream after the group shuffle; batches must keep their GROUP
    membership rather than being re-sliced by a fixed stride (which shifted
    every later batch across two length groups)."""
    from cmhse_tpu.data.datasets import RaggedExample

    class _Lens:
        """video i has exactly i+1 frames in its single clip."""

        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def max_frame_len(self, idx):
            return idx + 1

        def __getitem__(self, idx):
            clip = np.full((idx + 1, 4), float(idx), np.float32)
            return RaggedExample(video_id=idx, clips=[clip],
                                 sentences=[np.array([1, 2], np.int32)])

    cfg = DataConfig(batch_size=4, feat_dim=4, vocab_size=8, max_clips=1,
                     max_frames=16, max_sentences=1, max_words=4,
                     frame_buckets=(4, 8, 16), word_buckets=(4,))
    ds = _Lens(10)  # 10 % 4 = 2: one short group among the three
    for seed in range(5):  # several shuffles: short group position varies
        sizes = []
        for batch in batches_from_dataset(ds, cfg, shuffle=True, seed=seed,
                                          fixed_shape=False,
                                          group_by_length=True):
            lens = sorted(int(l) for l in
                          np.asarray(batch.frame_len[:, 0])[
                              np.asarray(batch.valid)])
            sizes.append(len(lens))
            # each batch must be one contiguous run of the sorted lengths
            assert lens[-1] - lens[0] == len(lens) - 1, lens
        assert sorted(sizes) == [2, 4, 4]


def test_build_vocab_first_occurrence_order():
    """Word ids follow corpus FIRST-OCCURRENCE order — the reference's
    counter.items() order on modern Python (review r5: an alphabetical
    sort was deterministic but id-incompatible with a reference rebuild
    over the same captions)."""
    v = build_vocab(["zebra yak ant", "zebra yak ant"], threshold=2)
    base = 4  # <pad> <start> <end> <unk>
    assert v("zebra") == base
    assert v("yak") == base + 1
    assert v("ant") == base + 2


def test_bucket_ignores_clips_beyond_caps():
    """A long clip/sentence BEYOND max_clips/max_sentences is truncated by
    pad_batch, so it must not drag the batch into a bigger bucket (review
    r5 — wasted padding FLOPs are exactly what bucketing exists to
    remove)."""
    from cmhse_tpu.data.bucketing import bucket_for_examples
    from cmhse_tpu.data.datasets import RaggedExample

    short = np.zeros((6, 4), np.float32)           # 6-frame clips
    long = np.zeros((60, 4), np.float32)           # 60 frames, PAST the cap
    ex = RaggedExample(
        video_id=0,
        clips=[short, short, long],                # clip 3 > max_clips=2
        sentences=[np.ones(3, np.int32), np.ones(2, np.int32),
                   np.ones(30, np.int32)],         # sent 3 > max_sentences=2
    )
    spec = bucket_for_examples(
        [ex], batch_size=1, feat_dim=4, max_clips=2, max_sentences=2,
        frame_buckets=(8, 64), word_buckets=(8, 32))
    assert spec.max_frames == 8   # not dragged to 64 by the dropped clip
    assert spec.max_words == 8    # not dragged to 32 by the dropped sentence
