"""The CMHSE model: flat (FSE) and hierarchical (HSE / full CMHSE) variants.

Rebuilds the reference's ``model.py`` encoder stack (SURVEY.md C4-C6, C8):
  * flat (BASELINE config 1): one GRU per modality over the whole sequence —
    the VSE-style baseline (paper's FSE);
  * hierarchical (config 2): frames->clip and clips->video GRUs on the video
    side, words->sentence and sentences->paragraph on the text side;
  * full CMHSE (config 3): + attention pooling readout and a layer-wise
    reconstruction decoder (paper tau term, SURVEY.md C8).

All four encoders share one :class:`MaskedGRU` implementation. The low-level
encoders run over ``[B * Cmax]`` flattened rows — one big batched scan, not a
Python loop over clips — so the MXU sees ``[B*Cmax, H] x [H, 3H]`` GEMMs.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from flax import struct
from jax import Array

from cmhse_tpu.config import ModelConfig
from cmhse_tpu.data.batch import Batch
from cmhse_tpu.models.encoders import SequenceEncoder, WordEmbedding


@struct.dataclass
class ModelOutputs:
    """Everything the objective needs, in one pytree."""

    video_emb: Array  # [B, E]   L2-normalized
    para_emb: Array  # [B, E]
    clip_emb: Array  # [B, Cmax, E]  L2-normalized low-level video embeddings
    sent_emb: Array  # [B, Smax, E]
    clip_valid: Array  # bool[B, Cmax]
    sent_valid: Array  # bool[B, Smax]
    video_recon: Array | None  # [B, Cmax, E] decoder predictions; None when
    # the model has no reconstruction decoders (the objective skips the term)
    text_recon: Array | None  # [B, Smax, E]


# minimum decoder sequence length at which the seeded-h0 Pallas kernels
# engage (module-level so scripts/recon_profile.py can force either path
# for an honest A/B on hardware); see the routing comment in __call__
DECODER_PALLAS_MIN_T = 16


class ReconstructionDecoder(nn.Module):
    """GRU decoder reconstructing the low-level embedding sequence from the
    high-level embedding (SURVEY.md C8; paper's layer-wise reconstruction).

    Teacher-forced: input at step t is the true low-level embedding at t-1
    (zeros at t=0); the initial state is a projection of the high-level
    embedding. Outputs live in the joint space.
    """

    embed_size: int
    rnn_hidden: int
    dtype: Any = jnp.float32
    use_pallas_gru: bool = False

    @nn.compact
    def __call__(self, high_emb: Array, low_seq: Array, lengths: Array) -> Array:
        # high_emb: [B, E]; low_seq: [B, T, E]; lengths: [B]
        b, t, e = low_seq.shape
        h0 = jnp.tanh(
            nn.Dense(self.rnn_hidden, dtype=self.dtype, name="init")(high_emb)
        )
        shifted = jnp.concatenate(
            [jnp.zeros((b, 1, e), low_seq.dtype), low_seq[:, :-1]], axis=1
        )
        # custom h0 (the high-level embedding) needs the functional core
        import jax

        from cmhse_tpu.models.gru import gru_sequence

        scale = 1.0 / self.rnn_hidden**0.5
        init = lambda key, shape, dtype: jax.random.uniform(
            key, shape, dtype, -scale, scale
        )  # symmetric, matching MaskedGRU / torch GRU reset_parameters
        w_i = self.param(
            "w_i", init, (e, 3 * self.rnn_hidden), jnp.float32,
        )
        w_h = self.param(
            "w_h", init, (self.rnn_hidden, 3 * self.rnn_hidden), jnp.float32,
        )
        # biases share the same symmetric uniform as the weights — torch
        # GRU reset_parameters initializes EVERY parameter (biases
        # included) uniform(-1/sqrt(H), 1/sqrt(H)), and MaskedGRU matches
        # it; an earlier revision used zeros here, drifting the config-3
        # fresh-init distribution from both (review r5)
        b_i = self.param("b_i", init, (3 * self.rnn_hidden,), jnp.float32)
        b_h = self.param("b_h", init, (3 * self.rnn_hidden,), jnp.float32)
        # Fused-kernel routing is LENGTH-GATED, unlike the encoders: at the
        # flagship config-3 shape the decoder sequences are only Cmax=8
        # steps, where the kernel's fixed costs (grid setup + gate streaming
        # for the BPTT backward) outweigh the scan's per-step inefficiency
        # (measured A/B: scripts/recon_profile.py, PERFORMANCE.md). The
        # seeded-h0 kernels engage at T >= DECODER_PALLAS_MIN_T
        # (hardware-smoked both ways, scripts/tpu_smoke.py 4c).
        if self.use_pallas_gru and t >= DECODER_PALLAS_MIN_T:
            # fused time loop + BPTT custom VJP, seeded-h0 variant (the h0
            # gradient flows back to the init projection)
            from cmhse_tpu.ops.pallas_gru_grad import pallas_gru_trainable

            x = shifted.astype(self.dtype)
            outs, _ = pallas_gru_trainable(
                x, lengths, w_i, w_h, b_i, b_h, h0=h0.astype(self.dtype)
            )
        else:
            outs, _ = gru_sequence(shifted, lengths, w_i, w_h, b_i, b_h,
                                   h0=h0)
        return nn.Dense(self.embed_size, dtype=self.dtype, name="out")(outs)


class CMHSE(nn.Module):
    """Cross-Modal Hierarchical Sequence Embedding model.

    Public surface mirrors the reference wrapper (SURVEY.md C9): use
    ``apply(..., method=CMHSE.encode_video)`` / ``encode_text`` for the
    eval/serving path and ``__call__`` for training.
    """

    cfg: ModelConfig
    vocab_size: int

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        low_readout = "attn" if c.attention_pool else c.readout
        high_readout = "attn" if c.attention_pool else "last"
        pallas_gru = c.pallas_gru
        self.word_embedding = WordEmbedding(
            vocab_size=self.vocab_size, word_dim=c.word_dim
        )
        self.video_low = SequenceEncoder(
            embed_size=c.embed_size, rnn_hidden=c.rnn_hidden,
            readout=low_readout, bidirectional=c.bidirectional, dtype=dtype,
            use_pallas_gru=pallas_gru, name="video_low",
        )
        self.text_low = SequenceEncoder(
            embed_size=c.embed_size, rnn_hidden=c.rnn_hidden,
            readout=low_readout, bidirectional=c.bidirectional, dtype=dtype,
            use_pallas_gru=pallas_gru, name="text_low",
        )
        if c.hierarchical:
            self.video_high = SequenceEncoder(
                embed_size=c.embed_size, rnn_hidden=c.rnn_hidden,
                readout=high_readout, dtype=dtype,
                use_pallas_gru=pallas_gru, name="video_high",
            )
            self.text_high = SequenceEncoder(
                embed_size=c.embed_size, rnn_hidden=c.rnn_hidden,
                readout=high_readout, dtype=dtype,
                use_pallas_gru=pallas_gru, name="text_high",
            )
        if c.reconstruction:
            self.video_decoder = ReconstructionDecoder(
                embed_size=c.embed_size, rnn_hidden=c.rnn_hidden,
                dtype=dtype, use_pallas_gru=pallas_gru, name="video_decoder",
            )
            self.text_decoder = ReconstructionDecoder(
                embed_size=c.embed_size, rnn_hidden=c.rnn_hidden,
                dtype=dtype, use_pallas_gru=pallas_gru, name="text_decoder",
            )

    # ---- public encode entry points (reference parity: encode_video /
    # encode_text; BASELINE.json:5) -------------------------------------

    def encode_video(
        self, frames: Array, frame_len: Array, clip_len: Array
    ) -> tuple[Array, Array]:
        """frames f32[B, C, F, feat] -> (video_emb [B, E], clip_emb [B, C, E])."""
        b, cmax, fmax, feat = frames.shape
        flat = frames.reshape(b * cmax, fmax, feat)
        flat_len = frame_len.reshape(b * cmax)
        clip_emb, _ = self.video_low(flat, flat_len)  # [B*C, E]
        clip_emb = clip_emb.reshape(b, cmax, -1)
        if not self.cfg.hierarchical:
            if cmax != 1:
                raise ValueError(
                    "flat (non-hierarchical) model requires max_clips == 1 "
                    f"(got Cmax={cmax}); load the data with flat=True "
                    "(PrecompDataset/SyntheticHierarchicalDataset) or set "
                    "DataConfig.max_clips=1 — otherwise clips beyond slot 0 "
                    "would be silently discarded"
                )
            return clip_emb[:, 0], clip_emb
        video_emb, _ = self.video_high(clip_emb, clip_len)
        return video_emb, clip_emb

    def encode_text(
        self, words: Array, word_len: Array, sent_len: Array
    ) -> tuple[Array, Array]:
        """words i32[B, S, W] -> (para_emb [B, E], sent_emb [B, S, E])."""
        b, smax, wmax = words.shape
        vecs = self.word_embedding(words.reshape(b * smax, wmax))
        flat_len = word_len.reshape(b * smax)
        sent_emb, _ = self.text_low(vecs, flat_len)  # [B*S, E]
        sent_emb = sent_emb.reshape(b, smax, -1)
        if not self.cfg.hierarchical:
            if smax != 1:
                raise ValueError(
                    "flat (non-hierarchical) model requires "
                    f"max_sentences == 1 (got Smax={smax}); load the data "
                    "with flat=True or set DataConfig.max_sentences=1"
                )
            return sent_emb[:, 0], sent_emb
        para_emb, _ = self.text_high(sent_emb, sent_len)
        return para_emb, sent_emb

    # ---- training forward ------------------------------------------------

    def __call__(self, batch: Batch) -> ModelOutputs:
        video_emb, clip_emb = self.encode_video(
            batch.frames, batch.frame_len, batch.clip_len
        )
        para_emb, sent_emb = self.encode_text(
            batch.words, batch.word_len, batch.sent_len
        )
        if self.cfg.reconstruction and self.cfg.hierarchical:
            video_recon = self.video_decoder(
                video_emb, clip_emb, batch.clip_len
            )
            text_recon = self.text_decoder(para_emb, sent_emb, batch.sent_len)
        else:
            # None (not zeros): the objective must not compute an MSE between
            # a placeholder and the real embeddings when no decoder exists
            video_recon = None
            text_recon = None
        return ModelOutputs(
            video_emb=video_emb,
            para_emb=para_emb,
            clip_emb=clip_emb,
            sent_emb=sent_emb,
            clip_valid=batch.clip_valid(),
            sent_valid=batch.sent_valid(),
            video_recon=video_recon,
            text_recon=text_recon,
        )
