"""The fixed-shape masked batch pytree — the spine of the framework
(SURVEY.md section 7 step 1: the data contract).

Replaces the reference's sort-by-length + zero-pad collate (``data.py``
``collate_fn``; SURVEY.md C3). Shapes are STATIC per bucket; raggedness lives
entirely in the length fields. Padded rows (short final batches) are flagged
via ``valid`` so every batch of a bucket compiles to one XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct
from jax import Array


@struct.dataclass
class Batch:
    """One padded video-paragraph batch at both hierarchy levels.

    Video side:
      frames:    [B, Cmax, Fmax, feat]     clip frame features, f32 or bf16
                 (DataConfig.feature_dtype; models cast to their compute
                 dtype on entry either way)
      frame_len: i32[B, Cmax]              valid frames per clip (0 = pad clip)
      clip_len:  i32[B]                    valid clips per video
    Text side:
      words:     i32[B, Smax, Wmax]        caption token ids
      word_len:  i32[B, Smax]              valid words per sentence
      sent_len:  i32[B]                    valid sentences per paragraph
    Bookkeeping:
      video_ids: i32[B]  dataset-level id (positive-mask groups, eval align)
      valid:     bool[B] row validity (False = padding row of a short batch)
    """

    frames: Array
    frame_len: Array
    clip_len: Array
    words: Array
    word_len: Array
    sent_len: Array
    video_ids: Array
    valid: Array

    @property
    def batch_size(self) -> int:
        return self.frames.shape[0]

    @property
    def max_clips(self) -> int:
        return self.frames.shape[1]

    @property
    def max_sentences(self) -> int:
        return self.words.shape[1]

    def clip_valid(self) -> Array:
        """bool[B, Cmax] — which clip slots are real."""
        c = self.frames.shape[1]
        return (jnp.arange(c)[None, :] < self.clip_len[:, None]) & self.valid[:, None]

    def sent_valid(self) -> Array:
        """bool[B, Smax] — which sentence slots are real."""
        s = self.words.shape[1]
        return (jnp.arange(s)[None, :] < self.sent_len[:, None]) & self.valid[:, None]
