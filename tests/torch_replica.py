"""A minimal PyTorch replica of the reference CMHSE model (SURVEY.md C4-C9:
word embedding + four GRU encoders + joint-space Linear + l2norm + VSE++
max-of-hinges loss + the tau reconstruction decoder), used by
tests/test_reference_parity.py to prove the full-model numerics of the JAX
rebuild — not just the GRU cell — match what torch/cuDNN semantics produce.

This file replicates reference *behavior* (packed-sequence GRUs, VSE++ loss)
so that transplanting its weights into the JAX model via cmhse_tpu.interop
must reproduce embeddings to <=1e-5 and retrieval ranks exactly. It is test
scaffolding, not product code, and is the shape a real reference checkpoint's
state_dict would load into.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

EPS = 1e-8


def l2norm_t(x: torch.Tensor) -> torch.Tensor:
    """Same formula as cmhse_tpu.ops.similarity.l2norm: x * rsqrt(sq + eps^2)."""
    sq = (x.float() ** 2).sum(dim=-1, keepdim=True)
    return x.float() * torch.rsqrt(sq + EPS * EPS)


def _run_gru_ragged(gru: nn.GRU, x: torch.Tensor, lengths: np.ndarray):
    """Packed-sequence GRU over rows with length >= 1; zero rows skipped.

    Returns (outs [N, T, dirs*H] zero-padded like pad_packed_sequence,
    final [N, dirs*H] with zeros for skipped rows) — final-state-at-true-
    length, exactly what the reference got from cuDNN via
    pack_padded_sequence. Bidirectional: final = [h_fwd(L-1), h_bwd(0)]
    concatenated, the torch h_n = [2, N, H] layout."""
    n, t = x.shape[0], x.shape[1]
    dirs = 2 if gru.bidirectional else 1
    h = gru.hidden_size
    keep = lengths >= 1
    outs = torch.zeros(n, t, dirs * h)
    final = torch.zeros(n, dirs * h)
    if keep.any():
        packed = pack_padded_sequence(
            x[keep], torch.from_numpy(lengths[keep]), batch_first=True,
            enforce_sorted=False,
        )
        out_p, h_n = gru(packed)
        out, _ = pad_packed_sequence(out_p, batch_first=True, total_length=t)
        outs[keep] = out
        final[keep] = torch.cat([h_n[d] for d in range(dirs)], dim=-1)
    return outs, final


class TorchSequenceEncoder(nn.Module):
    """GRU + readout (last | attn) + optional joint projection + l2norm."""

    def __init__(self, in_dim, hidden, embed, readout="last", attn_dim=256,
                 bidirectional=False):
        super().__init__()
        self.gru = nn.GRU(in_dim, hidden, batch_first=True,
                          bidirectional=bidirectional)
        self.readout = readout
        width = hidden * (2 if bidirectional else 1)
        self.proj = nn.Linear(width, embed) if width != embed else None
        if readout == "attn":
            self.attn_proj = nn.Linear(width, attn_dim)
            self.attn_score = nn.Linear(attn_dim, 1, bias=False)

    def forward(self, x, lengths: np.ndarray):
        outs, final = _run_gru_ragged(self.gru, x, lengths)
        if self.readout == "last":
            emb = final
        elif self.readout == "attn":
            t = outs.shape[1]
            scores = self.attn_score(torch.tanh(self.attn_proj(outs)))[..., 0]
            mask = (
                torch.arange(t)[None, :]
                < torch.from_numpy(lengths.astype(np.int64))[:, None]
            )
            scores = torch.where(mask, scores, torch.tensor(-1e9))
            alpha = torch.softmax(scores, dim=-1)
            alpha = torch.where(mask, alpha, torch.tensor(0.0))
            emb = torch.einsum("nt,nth->nh", alpha, outs)
        else:
            raise ValueError(self.readout)
        if self.proj is not None:
            emb = self.proj(emb)
        return l2norm_t(emb), outs


class TorchReconDecoder(nn.Module):
    """Teacher-forced GRU decoder: h0 = tanh(Linear(high)), out Linear."""

    def __init__(self, embed, hidden):
        super().__init__()
        self.init = nn.Linear(embed, hidden)
        self.gru = nn.GRU(embed, hidden, batch_first=True)
        self.out = nn.Linear(hidden, embed)

    def forward(self, high, low_seq):
        b, t, e = low_seq.shape
        h0 = torch.tanh(self.init(high))[None]  # [1, B, H]
        shifted = torch.cat([torch.zeros(b, 1, e), low_seq[:, :-1]], dim=1)
        outs, _ = self.gru(shifted, h0)  # full length; compare valid steps
        return self.out(outs)


class TorchCMHSE(nn.Module):
    """Flat / hierarchical / full replica of the reference encoder stack."""

    def __init__(self, vocab, word_dim, feat_dim, hidden, embed,
                 hierarchical=True, attention_pool=False, reconstruction=False,
                 bidirectional=False):
        super().__init__()
        low = "attn" if attention_pool else "last"
        high = "attn" if attention_pool else "last"
        self.hierarchical = hierarchical
        self.reconstruction = reconstruction
        self.embedding = nn.Embedding(vocab, word_dim)
        # bidirectional applies to the LOW encoders only, mirroring
        # ModelConfig.bidirectional's consumption in models/cmhse.py setup()
        self.video_low = TorchSequenceEncoder(feat_dim, hidden, embed, low,
                                              bidirectional=bidirectional)
        self.text_low = TorchSequenceEncoder(word_dim, hidden, embed, low,
                                             bidirectional=bidirectional)
        if hierarchical:
            self.video_high = TorchSequenceEncoder(embed, hidden, embed, high)
            self.text_high = TorchSequenceEncoder(embed, hidden, embed, high)
        if reconstruction:
            self.video_decoder = TorchReconDecoder(embed, hidden)
            self.text_decoder = TorchReconDecoder(embed, hidden)

    def encode_video(self, frames: np.ndarray, frame_len: np.ndarray,
                     clip_len: np.ndarray):
        b, c, f, feat = frames.shape
        rows = torch.from_numpy(frames.reshape(b * c, f, feat))
        rlen = frame_len.reshape(-1)
        clip_emb, _ = self.video_low(rows, rlen)
        clip_emb = clip_emb.view(b, c, -1)
        if not self.hierarchical:
            return clip_emb[:, 0], clip_emb
        video_emb, _ = self.video_high(clip_emb, clip_len)
        return video_emb, clip_emb

    def encode_text(self, words: np.ndarray, word_len: np.ndarray,
                    sent_len: np.ndarray):
        b, s, w = words.shape
        vecs = self.embedding(torch.from_numpy(words.reshape(b * s, w)).long())
        sent_emb, _ = self.text_low(vecs, word_len.reshape(-1))
        sent_emb = sent_emb.view(b, s, -1)
        if not self.hierarchical:
            return sent_emb[:, 0], sent_emb
        para_emb, _ = self.text_high(sent_emb, sent_len)
        return para_emb, sent_emb


def vsepp_loss_t(a: torch.Tensor, b: torch.Tensor, margin: float) -> torch.Tensor:
    """VSE++ bidirectional max-of-hinges over aligned rows, scaled to the
    per-query mean (the reference used .sum(); the rebuild divides by the
    valid-query count so the loss is batch-size invariant under bucketing —
    a documented constant factor absorbed by the learning rate)."""
    n = a.shape[0]
    sims = a @ b.t()
    diag = sims.diag()
    eye = torch.eye(n, dtype=torch.bool)
    cost_s = (margin + sims - diag[:, None]).clamp(min=0).masked_fill(eye, 0)
    cost_im = (margin + sims - diag[None, :]).clamp(min=0).masked_fill(eye, 0)
    return (cost_s.max(dim=1).values.sum()
            + cost_im.max(dim=0).values.sum()) / n


def recon_loss_t(pred: torch.Tensor, target: torch.Tensor,
                 mask: np.ndarray) -> torch.Tensor:
    """Masked MSE matching cmhse_tpu.ops.loss.reconstruction_loss."""
    m = torch.from_numpy(mask.copy())
    err = ((pred - target) ** 2).sum(dim=-1)
    err = torch.where(m, err, torch.tensor(0.0))
    return err.sum() / m.float().sum().clamp(min=1.0)
