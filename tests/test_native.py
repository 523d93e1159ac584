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
