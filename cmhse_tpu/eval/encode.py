"""Gallery encoding (rebuilds SURVEY.md C11: the reference's
``evaluation.py`` ``encode_data(model, loader)`` which collected all
embeddings into host numpy arrays).

Two paths:
  * :func:`encode_data` — reference-shaped HOST collection: every batch's
    embeddings round-trip to numpy and padded rows are dropped. Use it when
    downstream code wants compact host arrays (offline analysis, export).
  * :func:`encode_gallery_device` — the PRODUCTION path: embeddings stay on
    device, padded rows are kept in place and flagged via ``valid``, and
    only final scalars ever cross to the host (what SURVEY.md section 3.2
    demands). Eval and serving build on this one.

The encode itself is one jitted function per bucket shape, cached at module
level so periodic validation and new Retriever instances never recompile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from cmhse_tpu.data.batch import Batch
from cmhse_tpu.models.cmhse import CMHSE


@functools.lru_cache(maxsize=32)
def _jitted_encode(mcfg, vocab_size: int):
    """One compiled encode program per (ModelConfig, vocab) — reused across
    encode_data calls so periodic validation never recompiles."""
    model = CMHSE(cfg=mcfg, vocab_size=vocab_size)

    @jax.jit
    def _encode(params, batch: Batch):
        v, clip = model.apply(
            {"params": params}, batch.frames, batch.frame_len, batch.clip_len,
            method=CMHSE.encode_video,
        )
        p, sent = model.apply(
            {"params": params}, batch.words, batch.word_len, batch.sent_len,
            method=CMHSE.encode_text,
        )
        return v, p, clip, sent

    return _encode


@functools.lru_cache(maxsize=32)
def _jitted_text_encode(mcfg, vocab_size: int):
    """One compiled text-encode program per (ModelConfig, vocab) — shared by
    every Retriever instance so constructing a new one never recompiles."""
    model = CMHSE(cfg=mcfg, vocab_size=vocab_size)

    @jax.jit
    def _encode(params, words, word_len, sent_len):
        emb, _ = model.apply(
            {"params": params}, words, word_len, sent_len,
            method=CMHSE.encode_text,
        )
        return emb

    return _encode


@functools.lru_cache(maxsize=32)
def _jitted_video_encode(mcfg, vocab_size: int):
    """One compiled video-encode program per (ModelConfig, vocab) — the
    query-side encoder of video->paragraph serving (Retriever.retrieve_video);
    module-level cache like the text one."""
    model = CMHSE(cfg=mcfg, vocab_size=vocab_size)

    @jax.jit
    def _encode(params, frames, frame_len, clip_len):
        emb, _ = model.apply(
            {"params": params}, frames, frame_len, clip_len,
            method=CMHSE.encode_video,
        )
        return emb

    return _encode


def _resolve_pallas(mcfg, use_pallas_gru: bool | None):
    """Resolve the encode-time Pallas GRU toggle: None = auto (on for real
    TPU, off elsewhere — interpret mode is slower than the scan). The flag
    OVERRIDES the config in both directions, so a config saved from a TPU
    training run (pallas_gru=True in config.json) does not force interpret
    mode when evaluated on a CPU host."""
    if use_pallas_gru is None:
        use_pallas_gru = jax.devices()[0].platform == "tpu"
    if mcfg.pallas_gru != use_pallas_gru:
        import dataclasses

        mcfg = dataclasses.replace(mcfg, pallas_gru=use_pallas_gru)
    return mcfg


def encode_data(
    model: CMHSE,
    params,
    batches,
    return_low_level: bool = False,
    use_pallas_gru: bool | None = None,
):
    """HOST-collecting encode (reference ``encode_data`` shape): returns
    (video_embs [N, E], para_embs [N, E], video_ids [N]) with padded rows
    dropped, plus optionally the low-level (clip, sentence) embeddings and
    their masks. Each batch's embeddings cross to host numpy — prefer
    :func:`encode_gallery_device` on hot paths.

    ``batches`` is any iterable of :class:`Batch` (host or device).
    ``use_pallas_gru``: swap in the fused forward-only Pallas GRU time loop
    (same params pytree, parity-tested). ``None`` = auto: on for real TPU,
    off elsewhere (interpret mode would be slower than the scan).
    """
    mcfg = _resolve_pallas(model.cfg, use_pallas_gru)
    _encode = _jitted_encode(mcfg, model.vocab_size)

    v_all, p_all, ids_all = [], [], []
    clip_all, sent_all, cmask_all, smask_all = [], [], [], []
    for batch in batches:
        v, p, clip, sent = _encode(params, batch)
        keep = np.asarray(batch.valid)
        v_all.append(np.asarray(v)[keep])
        p_all.append(np.asarray(p)[keep])
        ids_all.append(np.asarray(batch.video_ids)[keep])
        if return_low_level:
            clip_all.append(np.asarray(clip)[keep])
            sent_all.append(np.asarray(sent)[keep])
            cmask_all.append(np.asarray(batch.clip_valid())[keep])
            smask_all.append(np.asarray(batch.sent_valid())[keep])

    if not v_all:
        raise ValueError("no batches to encode (empty split or empty "
                         "per-process slice)")
    video_embs = jnp.asarray(np.concatenate(v_all))
    para_embs = jnp.asarray(np.concatenate(p_all))
    video_ids = np.concatenate(ids_all)
    if not return_low_level:
        return video_embs, para_embs, video_ids
    return (
        video_embs,
        para_embs,
        video_ids,
        [np.concatenate(x) if x else None
         for x in (clip_all, sent_all, cmask_all, smask_all)],
    )


def encode_gallery_device(
    model: CMHSE,
    params,
    batches,
    use_pallas_gru: bool | None = None,
    return_ids: bool = False,
):
    """Device-resident gallery encode: no per-batch host transfers.

    Returns (video_embs [Np, E], para_embs [Np, E], valid bool[Np]) where
    padded rows are KEPT in place (aligned across both modalities) and
    flagged by ``valid`` — the masked metric paths exclude them. This is the
    production eval path: only the final scalar metrics cross to the host.

    ``return_ids``: additionally return ``video_ids`` int32[Np] (host array;
    ids live on the host already, so this costs no device transfer). Used by
    serving to map gallery row indices back to dataset keys.
    """
    mcfg = _resolve_pallas(model.cfg, use_pallas_gru)
    _encode = _jitted_encode(mcfg, model.vocab_size)

    v_all, p_all, valid_all, ids_all = [], [], [], []
    for batch in batches:
        v, p, _, _ = _encode(params, batch)
        v_all.append(v)
        p_all.append(p)
        valid_all.append(batch.valid)
        if return_ids:
            ids_all.append(np.asarray(batch.video_ids))
    if not v_all:
        raise ValueError("no batches to encode (empty split or empty "
                         "per-process slice)")
    out = (
        jnp.concatenate(v_all),
        jnp.concatenate(p_all),
        jnp.concatenate([jnp.asarray(v) for v in valid_all]),
    )
    if return_ids:
        return out + (np.concatenate(ids_all),)
    return out
