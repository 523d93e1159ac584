"""Native C++ packer parity vs the numpy pad_batch path."""

import numpy as np
import pytest

from cmhse_tpu.data import SyntheticHierarchicalDataset
from cmhse_tpu.data.bucketing import BucketSpec, pad_batch
from cmhse_tpu.native import available, pack_batch_native


pytestmark = pytest.mark.skipif(
    not available(), reason="native packer could not be built"
)


@pytest.mark.parametrize("n_examples", [5, 8])  # short batch + full batch
def test_native_pack_matches_numpy(n_examples):
    ds = SyntheticHierarchicalDataset(num_videos=8, feat_dim=12, max_clips=4,
                                      max_frames=10, max_words=7, seed=3)
    spec = BucketSpec(batch_size=8, max_clips=4, max_frames=10,
                      max_sentences=4, max_words=7, feat_dim=12)
    examples = [ds[i] for i in range(n_examples)]
    want = pad_batch(examples, spec)
    got = pack_batch_native(examples, spec)
    for field in ("frames", "frame_len", "clip_len", "words", "word_len",
                  "sent_len", "video_ids", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, field)), np.asarray(getattr(want, field)),
            err_msg=f"field {field} diverged",
        )


def test_native_pack_bf16_matches_numpy():
    """bf16 batches: the native packer converts in the copy loop
    (pack_frames_bf16, RNE); output must be bit-identical to the numpy
    path's allocate-in-bf16 + row-assign cast, including tricky rounding
    cases (halfway values, NaN, inf, tiny/huge magnitudes)."""
    ds = SyntheticHierarchicalDataset(num_videos=8, feat_dim=12, max_clips=4,
                                      max_frames=10, max_words=7, seed=5)
    spec = BucketSpec(batch_size=8, max_clips=4, max_frames=10,
                      max_sentences=4, max_words=7, feat_dim=12,
                      feature_dtype="bfloat16")
    examples = [ds[i] for i in range(7)]
    # splice in adversarial values for the rounding-mode comparison
    special = np.asarray(
        [np.nan, np.inf, -np.inf, 0.0, -0.0, 1e-40, -1e-40, 3.0000002,
         1.0039062, 1.0039063, 65535.0, -65535.0],
        np.float32,
    )
    examples[0].clips[0][0, : len(special)] = special
    want = pad_batch(examples, spec)
    got = pack_batch_native(examples, spec)
    assert np.asarray(got.frames).dtype == np.asarray(want.frames).dtype
    np.testing.assert_array_equal(
        np.asarray(got.frames).view(np.uint16),
        np.asarray(want.frames).view(np.uint16),
        err_msg="bf16 bit patterns diverged between native and numpy packers",
    )


def test_native_pack_truncation():
    """Overlong clips/sentences truncate identically to the numpy path."""
    ds = SyntheticHierarchicalDataset(num_videos=4, feat_dim=6, max_clips=6,
                                      max_frames=20, max_words=15, seed=4)
    spec = BucketSpec(batch_size=4, max_clips=2, max_frames=5,
                      max_sentences=2, max_words=4, feat_dim=6)
    examples = [ds[i] for i in range(4)]
    want = pad_batch(examples, spec)
    got = pack_batch_native(examples, spec)
    np.testing.assert_array_equal(np.asarray(got.frames),
                                  np.asarray(want.frames))
    np.testing.assert_array_equal(np.asarray(got.word_len),
                                  np.asarray(want.word_len))
