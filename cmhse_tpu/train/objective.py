"""The full CMHSE training objective (rebuilds ``forward_loss`` of the
reference wrapper, SURVEY.md C9 + C7 + C8):

    L = w_high * L_rank(video, paragraph)
      + w_low  * L_rank(clips, sentences)          (flattened across batch)
      + tau    * (L_recon_video + L_recon_text)

The low-level term aligns clip k of video i with sentence k of video i
(ActivityNet Captions provides this 1:1 alignment). ALL slots sharing a
(video, k) group id are masked as positives so hard-negative mining never
picks a positive (SURVEY.md "hard parts" item 4).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cmhse_tpu.config import LossConfig
from cmhse_tpu.data.batch import Batch
from cmhse_tpu.models.cmhse import ModelOutputs
from cmhse_tpu.ops.loss import (
    contrastive_loss,
    positive_mask_from_ids,
    reconstruction_loss,
)
from cmhse_tpu.ops.pallas_sim import pallas_contrastive_loss


def _rank_loss(emb_a, emb_b, cfg: LossConfig, positive_mask, valid):
    """Dispatch between the Pallas-fused kernel and the jnp reference path.

    The fused kernel implements the max_violation (VSE++ hardest-negative)
    variant only; the sum-over-negatives variant always uses the jnp path.
    """
    if cfg.use_pallas and cfg.max_violation:
        return pallas_contrastive_loss(
            emb_a, emb_b, margin=cfg.margin,
            positive_mask=positive_mask, valid=valid,
        )
    return contrastive_loss(
        emb_a, emb_b, margin=cfg.margin, max_violation=cfg.max_violation,
        positive_mask=positive_mask, valid=valid,
    )


def total_loss(
    outputs: ModelOutputs,
    batch: Batch,
    cfg: LossConfig,
) -> tuple[Array, dict[str, Array]]:
    """Returns (scalar loss, metrics dict). All terms computed in float32."""
    metrics: dict[str, Array] = {}
    loss = jnp.float32(0.0)

    # ---- high level: video <-> paragraph --------------------------------
    if cfg.high_weight:
        high_pos = positive_mask_from_ids(batch.video_ids, batch.video_ids)
        l_high = _rank_loss(
            outputs.video_emb, outputs.para_emb, cfg,
            positive_mask=high_pos, valid=batch.valid,
        )
        metrics["loss_high"] = l_high
        loss = loss + cfg.high_weight * l_high

    # ---- low level: clip <-> sentence, flattened over the batch ---------
    if cfg.low_weight:
        b, cmax, e = outputs.clip_emb.shape
        smax = outputs.sent_emb.shape[1]
        if cmax != smax:
            raise ValueError(
                "low-level loss requires aligned clip/sentence slot counts; "
                f"got Cmax={cmax} Smax={smax}"
            )
        clips = outputs.clip_emb.reshape(b * cmax, e)
        sents = outputs.sent_emb.reshape(b * smax, e)
        # group id (video, slot); unique per aligned pair
        slot = jnp.arange(cmax)[None, :]
        pair_ids = (batch.video_ids[:, None] * cmax + slot).reshape(-1)
        low_pos = positive_mask_from_ids(pair_ids, pair_ids)
        low_valid = (
            outputs.clip_valid.reshape(-1) & outputs.sent_valid.reshape(-1)
        )
        l_low = _rank_loss(
            clips, sents, cfg, positive_mask=low_pos, valid=low_valid,
        )
        metrics["loss_low"] = l_low
        loss = loss + cfg.low_weight * l_low

    # ---- layer-wise reconstruction (tau term, C8) ------------------------
    # Gated on the model actually producing decoder outputs, not just on the
    # weight: a config with recon_weight>0 but ModelConfig.reconstruction=False
    # must not score an MSE against a placeholder (ADVICE.md round 1).
    if cfg.recon_weight and outputs.video_recon is not None:
        l_rec_v = reconstruction_loss(
            outputs.video_recon, outputs.clip_emb, outputs.clip_valid
        )
        l_rec_t = reconstruction_loss(
            outputs.text_recon, outputs.sent_emb, outputs.sent_valid
        )
        metrics["loss_recon"] = l_rec_v + l_rec_t
        loss = loss + cfg.recon_weight * (l_rec_v + l_rec_t)

    metrics["loss"] = loss
    return loss, metrics
