"""Encoder modules (rebuilds SURVEY.md C4-C6: the reference ``model.py``
EncoderVideo / EncoderText low-level GRUs and the high-level hierarchy GRUs,
plus the full-config attention pooling).

Hierarchy (paper arXiv:1810.07212, fig. 2):
  video side:  frames --GRU--> clip embedding --GRU--> video embedding
  text side:   words  --GRU--> sentence embed --GRU--> paragraph embedding
Every embedding is projected to the joint space and L2-normalized.

TPU-first notes:
  * the low-level GRU runs over ``[B * Cmax]`` flattened clip rows so the
    per-step GEMM is ``[B*Cmax, H] @ [H, 3H]`` — bigger MXU tiles than a
    Python loop over clips;
  * ragged structure is carried entirely by ``frame_len``/``clip_len`` masks;
    no sort-by-length, no packing (SURVEY.md section 3.3).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import Array

from cmhse_tpu.models.gru import MaskedGRU, masked_mean
from cmhse_tpu.ops.similarity import l2norm


class AttentionPool(nn.Module):
    """Self-attentive pooling over per-step GRU states (BASELINE config 3).

    scores_t = v . tanh(W h_t);  alpha = masked softmax(scores);
    pooled = sum_t alpha_t h_t.  A single small projection — cheap on the VPU,
    fused by XLA into the surrounding elementwise graph.
    """

    attn_dim: int = 256
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, states: Array, lengths: Array) -> Array:
        # states: [B, T, H], lengths: [B]
        t = states.shape[1]
        h = nn.Dense(self.attn_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="proj")(states)
        scores = nn.Dense(1, use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="score")(
            jnp.tanh(h)
        )[..., 0]  # [B, T]
        mask = jnp.arange(t)[None, :] < lengths[:, None]
        scores = jnp.where(mask, scores, -1e9)
        alpha = jax.nn.softmax(scores, axis=-1)
        alpha = jnp.where(mask, alpha, 0.0)  # zero rows with length 0
        return jnp.einsum("bt,bth->bh", alpha, states)


class SequenceEncoder(nn.Module):
    """GRU + readout + joint-space projection + L2 norm: one hierarchy stage.

    readout: "last" (state at true length, the reference default), "mean"
    (masked mean over steps), or "attn" (AttentionPool; config 3).
    """

    embed_size: int
    rnn_hidden: int
    readout: str = "last"
    bidirectional: bool = False
    project: bool = True
    normalize: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas_gru: bool = False

    @nn.compact
    def __call__(self, x: Array, lengths: Array) -> tuple[Array, Array]:
        """Returns (embedding ``[B, E]``, states ``[B, T, H]``)."""
        outs, final = MaskedGRU(
            features=self.rnn_hidden,
            bidirectional=self.bidirectional,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_pallas=self.use_pallas_gru,
            name="gru",
        )(x, lengths)
        if self.readout == "last":
            emb = final
        elif self.readout == "mean":
            emb = masked_mean(outs, lengths)
        elif self.readout == "attn":
            emb = AttentionPool(dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="attn_pool")(outs, lengths)
        else:
            raise ValueError(f"unknown readout {self.readout!r}")
        if self.project and emb.shape[-1] != self.embed_size:
            emb = nn.Dense(self.embed_size, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="proj")(emb)
        if self.normalize:
            emb = l2norm(emb)
        return emb, outs


def embedding_lookup(table: Array, token_ids: Array) -> Array:
    """``table[token_ids]`` with a sorted-segment-sum backward.

    Autodiff of a plain gather emits an XLA scatter-add for the table
    gradient; on v5e at the flagship train shape (16384 ids into a
    [10000, 300] table) that scatter costs 0.475 ms/step, while sorting
    the ids and running ``segment_sum(indices_are_sorted=True)`` costs
    0.212 ms — 2.2x (measured; the sort is a cheap 16k-element key sort
    and the sorted hint lets XLA lower the add sequentially instead of
    as a gather-modify-write loop). Forward is identical; the gradient
    differs from the scatter only in f32 summation order."""
    return _embedding_lookup(table, token_ids, table.shape[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _embedding_lookup(table, token_ids, vocab):
    return jnp.take(table, token_ids, axis=0)


def _embedding_lookup_fwd(table, token_ids, vocab):
    return jnp.take(table, token_ids, axis=0), token_ids


def _embedding_lookup_bwd(vocab, token_ids, g):
    import numpy as _np

    flat_ids = token_ids.reshape(-1)
    # g.dtype == the table dtype (take preserves dtype); accumulate f32
    flat_g = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
    order = jnp.argsort(flat_ids)
    dtable = jax.ops.segment_sum(
        flat_g[order], flat_ids[order], num_segments=vocab,
        indices_are_sorted=True,
    ).astype(g.dtype)
    # integer primal: cotangent is float0 by convention
    return dtable, _np.zeros(token_ids.shape, jax.dtypes.float0)


_embedding_lookup.defvjp(_embedding_lookup_fwd, _embedding_lookup_bwd)


class WordEmbedding(nn.Module):
    """Token id -> word vector table (reference: ``nn.Embedding`` initialized
    from word2vec; SURVEY.md C5 / [B:7]). Pretrained vectors can be loaded by
    overwriting ``params['embedding']`` after init."""

    vocab_size: int
    word_dim: int = 300
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids: Array) -> Array:
        # symmetric +-0.1 init (the reference's nn.Embedding
        # init_weights uniform_(-0.1, 0.1); note flax's
        # nn.initializers.uniform samples [0, scale) — positive-only)
        init = lambda key, shape, dtype: jax.random.uniform(
            key, shape, dtype, -0.1, 0.1
        )
        table = self.param(
            "embedding", init, (self.vocab_size, self.word_dim),
            self.param_dtype,
        )
        return embedding_lookup(table, token_ids)
