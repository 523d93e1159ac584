"""Length-bucketed padding: ragged examples -> fixed-shape masked batches.

Replaces the reference's sort-by-length + pad + ``pack_padded_sequence``
collate (SURVEY.md C3, section 3.3). The sort existed only to satisfy cuDNN;
on TPU the requirements invert: shapes must be STATIC so XLA compiles once
per bucket, and raggedness is carried by masks. Bucket edges bound the
compile-cache size (SURVEY.md "hard parts" item 3).
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass

import numpy as np

from cmhse_tpu.data.batch import Batch


@dataclass(frozen=True)
class BucketSpec:
    """Static shape caps for one compiled bucket.

    ``feature_dtype``: dtype of the emitted ``frames`` array. The flagship
    models compute in bf16 and cast their inputs immediately
    (``models/gru.py``), so feeding bf16 features is numerically IDENTICAL
    for a bf16 model (f32->bf16 rounds once either way) while halving both
    host->device feature DMA and the on-device layout/convert work ahead of
    the first GEMM (measured ~0.5 ms/batch at the flagship encode shape).
    Keep float32 (the default) for f32/parity runs.
    """

    batch_size: int
    max_clips: int
    max_frames: int
    max_sentences: int
    max_words: int
    feat_dim: int
    feature_dtype: str = "float32"

    @property
    def signature(self) -> tuple:
        return (
            self.batch_size,
            self.max_clips,
            self.max_frames,
            self.max_sentences,
            self.max_words,
            self.feat_dim,
            self.feature_dtype,
        )

    def np_feature_dtype(self) -> np.dtype:
        if self.feature_dtype == "bfloat16":
            import ml_dtypes  # ships with jax

            return np.dtype(ml_dtypes.bfloat16)
        return np.dtype(self.feature_dtype)


def pick_bucket(value: int, edges: tuple[int, ...]) -> int:
    """Smallest bucket edge >= value (clamps to the largest edge)."""
    i = bisect.bisect_left(edges, value)
    return edges[min(i, len(edges) - 1)]


def pad_batch(examples: list, spec: BucketSpec) -> Batch:
    """Pad a list of :class:`RaggedExample` into one fixed-shape Batch.

    Examples beyond the spec's caps are truncated (frames/words tails drop);
    a batch shorter than ``spec.batch_size`` is padded with invalid rows.
    """
    b = spec.batch_size
    if len(examples) > b:
        raise ValueError(f"batch of {len(examples)} > spec batch_size {b}")
    cmax, fmax = spec.max_clips, spec.max_frames
    smax, wmax = spec.max_sentences, spec.max_words

    # allocate directly in the target dtype: the row assignments cast with
    # round-to-nearest-even, identical to a post-hoc astype, without a
    # second full-size buffer in the loader hot path
    frames = np.zeros((b, cmax, fmax, spec.feat_dim),
                      spec.np_feature_dtype())
    frame_len = np.zeros((b, cmax), np.int32)
    clip_len = np.zeros((b,), np.int32)
    words = np.zeros((b, smax, wmax), np.int32)
    word_len = np.zeros((b, smax), np.int32)
    sent_len = np.zeros((b,), np.int32)
    video_ids = np.full((b,), -1, np.int32)
    valid = np.zeros((b,), bool)

    for i, ex in enumerate(examples):
        nclip = min(len(ex.clips), cmax)
        clip_len[i] = nclip
        for c in range(nclip):
            feat = np.asarray(ex.clips[c], np.float32)
            nf = min(feat.shape[0], fmax)
            frames[i, c, :nf] = feat[:nf]
            frame_len[i, c] = nf
        nsent = min(len(ex.sentences), smax)
        sent_len[i] = nsent
        for s in range(nsent):
            ids = np.asarray(ex.sentences[s], np.int32)
            nw = min(ids.shape[0], wmax)
            words[i, s, :nw] = ids[:nw]
            word_len[i, s] = nw
        video_ids[i] = ex.video_id
        valid[i] = True

    return Batch(
        frames=frames,
        frame_len=frame_len,
        clip_len=clip_len,
        words=words,
        word_len=word_len,
        sent_len=sent_len,
        video_ids=video_ids,
        valid=valid,
    )


def bucket_for_examples(
    examples: list,
    batch_size: int,
    feat_dim: int,
    max_clips: int,
    max_sentences: int,
    frame_buckets: tuple[int, ...],
    word_buckets: tuple[int, ...],
    feature_dtype: str = "float32",
) -> BucketSpec:
    """Choose the (frames, words) bucket for a batch from its longest members.

    Only clips/sentences pad_batch will KEEP (the first max_clips /
    max_sentences) participate in the scan: a long clip past the cap is
    truncated away anyway, and letting it drag the batch into a bigger
    bucket wasted exactly the padding FLOPs bucketing exists to remove
    (review r5)."""
    fmax = max(
        (min(len(c), 1 << 30)
         for ex in examples for c in ex.clips[:max_clips]),
        default=1,
    )
    wmax = max(
        (len(s) for ex in examples for s in ex.sentences[:max_sentences]),
        default=1,
    )
    return BucketSpec(
        batch_size=batch_size,
        max_clips=max_clips,
        max_frames=pick_bucket(fmax, frame_buckets),
        max_sentences=max_sentences,
        max_words=pick_bucket(wmax, word_buckets),
        feat_dim=feat_dim,
        feature_dtype=feature_dtype,
    )
