"""PyTorch-layout weight import (reference checkpoint interop).

The reference (SURVEY.md C9) serialized ``torch.save({'model':
state_dict, ...})`` checkpoints whose tensors follow torch layouts:

  * fused GRU weights ``weight_ih_l0``/``weight_hh_l0`` of shape ``[3H, D]``
    with gate order (r, z, n) — our ``w_i``/``w_h`` are the transposes
    ``[D, 3H]`` with the SAME gate order (see models/gru.py docstring);
  * ``nn.Linear`` weight ``[out, in]`` — flax ``Dense`` kernel is ``[in, out]``;
  * ``nn.Embedding`` weight ``[vocab, dim]`` — identical layout.

This module is deliberately torch-free (plain numpy in, jnp pytree out) so
the package never imports torch; tests/test_reference_parity.py drives it
against a live ``torch.nn`` replica of the reference model to prove the
mapping end-to-end (embeddings <=1e-5, ranks exact).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gru_params_from_torch(
    weight_ih: np.ndarray,
    weight_hh: np.ndarray,
    bias_ih: np.ndarray,
    bias_hh: np.ndarray,
    direction: str = "fwd",
) -> dict:
    """Torch fused GRU tensors -> a :class:`MaskedGRU` param dict.

    ``weight_ih``/``weight_hh``: ``[3H, D]`` / ``[3H, H]`` (gate order r,z,n).
    ``direction``: "fwd" or "bwd" (bidirectional reverse weights).
    """
    return {
        f"{direction}_w_i": jnp.asarray(np.ascontiguousarray(weight_ih.T)),
        f"{direction}_w_h": jnp.asarray(np.ascontiguousarray(weight_hh.T)),
        f"{direction}_b_i": jnp.asarray(bias_ih),
        f"{direction}_b_h": jnp.asarray(bias_hh),
    }


def dense_params_from_torch(
    weight: np.ndarray, bias: np.ndarray | None = None
) -> dict:
    """Torch ``nn.Linear`` (weight ``[out, in]``) -> flax ``Dense`` params."""
    out = {"kernel": jnp.asarray(np.ascontiguousarray(weight.T))}
    if bias is not None:
        out["bias"] = jnp.asarray(bias)
    return out


def embedding_params_from_torch(weight: np.ndarray) -> dict:
    """Torch ``nn.Embedding`` -> :class:`WordEmbedding` params (same layout)."""
    return {"embedding": jnp.asarray(weight)}


def sequence_encoder_params_from_torch(
    gru_tensors: dict,
    proj: tuple[np.ndarray, np.ndarray] | None = None,
    attn_proj: tuple[np.ndarray, np.ndarray] | None = None,
    attn_score: np.ndarray | None = None,
) -> dict:
    """Assemble one :class:`SequenceEncoder`'s params from torch tensors.

    ``gru_tensors``: mapping with keys ``weight_ih_l0``/``weight_hh_l0``/
    ``bias_ih_l0``/``bias_hh_l0`` (plus ``*_reverse`` for bidirectional) —
    exactly the keys a torch ``nn.GRU`` contributes to a state_dict.
    ``proj``: (weight, bias) of the joint-space Linear, if the encoder has one
    (it exists only when rnn_hidden != embed_size, mirroring the model).
    ``attn_proj``/``attn_score``: attention-pool tensors (config 3).
    """
    gru = gru_params_from_torch(
        gru_tensors["weight_ih_l0"], gru_tensors["weight_hh_l0"],
        gru_tensors["bias_ih_l0"], gru_tensors["bias_hh_l0"],
    )
    if "weight_ih_l0_reverse" in gru_tensors:
        gru.update(gru_params_from_torch(
            gru_tensors["weight_ih_l0_reverse"],
            gru_tensors["weight_hh_l0_reverse"],
            gru_tensors["bias_ih_l0_reverse"],
            gru_tensors["bias_hh_l0_reverse"],
            direction="bwd",
        ))
    params: dict = {"gru": gru}
    if proj is not None:
        params["proj"] = dense_params_from_torch(*proj)
    if attn_proj is not None:
        params["attn_pool"] = {
            "proj": dense_params_from_torch(*attn_proj),
            "score": dense_params_from_torch(attn_score),
        }
    return params


def _pop_required(sd: dict, key: str, module: str):
    """``sd.pop`` with a readable error naming the module's actual keys —
    real-world checkpoints with slightly different naming should fail with
    guidance (MIGRATION.md / --prefix_map), not a bare KeyError."""
    try:
        return sd.pop(key)
    except KeyError:
        near = sorted(k for k in sd if k.startswith(module + "."))
        raise ValueError(
            f"state_dict is missing required tensor {key!r}; keys present "
            f"under {module!r}: {near or '(none)'} — check --prefix_map "
            "against the documented replica naming (MIGRATION.md)"
        ) from None


def _encoder_from_flat(sd: dict, prefix: str) -> dict:
    """One SequenceEncoder's params from flat ``{prefix}.gru.*`` /
    ``{prefix}.proj.*`` / ``{prefix}.attn_*`` state_dict keys."""
    base = ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0")
    gru = {k: _pop_required(sd, f"{prefix}.gru.{k}", prefix) for k in base}
    if f"{prefix}.gru.weight_ih_l0_reverse" in sd:
        gru.update({
            k: _pop_required(sd, f"{prefix}.gru.{k}", prefix)
            for k in ("weight_ih_l0_reverse", "weight_hh_l0_reverse",
                      "bias_ih_l0_reverse", "bias_hh_l0_reverse")
        })
    proj = None
    if f"{prefix}.proj.weight" in sd:
        proj = (sd.pop(f"{prefix}.proj.weight"),
                _pop_required(sd, f"{prefix}.proj.bias", prefix))
    attn_proj = attn_score = None
    if f"{prefix}.attn_proj.weight" in sd:
        attn_proj = (sd.pop(f"{prefix}.attn_proj.weight"),
                     _pop_required(sd, f"{prefix}.attn_proj.bias", prefix))
        attn_score = _pop_required(sd, f"{prefix}.attn_score.weight", prefix)
    return sequence_encoder_params_from_torch(gru, proj, attn_proj,
                                              attn_score)


def _decoder_from_flat(sd: dict, prefix: str) -> dict:
    gru = {k: _pop_required(sd, f"{prefix}.gru.{k}", prefix)
           for k in ("weight_ih_l0", "weight_hh_l0",
                     "bias_ih_l0", "bias_hh_l0")}
    return recon_decoder_params_from_torch(
        (_pop_required(sd, f"{prefix}.init.weight", prefix),
         _pop_required(sd, f"{prefix}.init.bias", prefix)),
        gru,
        (_pop_required(sd, f"{prefix}.out.weight", prefix),
         _pop_required(sd, f"{prefix}.out.bias", prefix)),
    )


# our component name -> the torch module prefix it loads from. Override via
# ``prefix_map`` when the real reference checkpoint uses different module
# names (the mount was empty at build time, so these default to the
# tests/torch_replica.py naming, which is also what MIGRATION.md documents).
DEFAULT_PREFIX_MAP = {
    "word_embedding": "embedding",
    "video_low": "video_low",
    "text_low": "text_low",
    "video_high": "video_high",
    "text_high": "text_high",
    "video_decoder": "video_decoder",
    "text_decoder": "text_decoder",
}


def infer_model_structure(state_dict: dict, prefix_map: dict | None = None) -> dict:
    """Infer the model hyperparameters a state_dict implies.

    Everything shape-recoverable is inferred: vocab/word_dim from the
    embedding table, feat_dim and rnn_hidden from the low video GRU's fused
    ``[3H, D]`` input weights, embed_size from the joint projection (when
    absent: the GRU output width — 2*rnn_hidden for bidirectional),
    hierarchical / attention_pool / reconstruction / bidirectional from
    which keys exist. Returns a dict of ``vocab_size`` plus the matching
    ModelConfig fields. NOT inferable from shapes: the GRU readout
    ('last' vs 'mean' — parameterless; pass it explicitly where it
    matters, e.g. ``cmhse-import --readout``).
    """
    pm = dict(DEFAULT_PREFIX_MAP)
    if prefix_map:
        pm.update(prefix_map)
    # non-destructive _pop_required: same guided error (naming --prefix_map
    # and the keys actually present) instead of a bare KeyError
    emb = _pop_required(dict(state_dict), f"{pm['word_embedding']}.weight",
                        pm["word_embedding"])
    w_ih = _pop_required(dict(state_dict),
                         f"{pm['video_low']}.gru.weight_ih_l0",
                         pm["video_low"])
    hidden, feat_dim = w_ih.shape[0] // 3, w_ih.shape[1]
    bidirectional = (
        f"{pm['video_low']}.gru.weight_ih_l0_reverse" in state_dict
    )
    proj_key = f"{pm['video_low']}.proj.weight"
    if proj_key in state_dict:
        embed = state_dict[proj_key].shape[0]
    else:
        # no projection => the encoder emits the GRU output width directly
        embed = hidden * (2 if bidirectional else 1)
    return {
        "vocab_size": int(emb.shape[0]),
        "word_dim": int(emb.shape[1]),
        "feat_dim": int(feat_dim),
        "rnn_hidden": int(hidden),
        "embed_size": int(embed),
        "hierarchical": f"{pm['video_high']}.gru.weight_ih_l0" in state_dict,
        "attention_pool": f"{pm['video_low']}.attn_proj.weight" in state_dict,
        "reconstruction": f"{pm['video_decoder']}.gru.weight_ih_l0"
                          in state_dict,
        "bidirectional": bidirectional,
    }


def model_params_from_state_dict(
    state_dict: dict,
    hierarchical: bool = True,
    reconstruction: bool = False,
    prefix_map: dict | None = None,
    strict: bool = True,
) -> dict:
    """A full reference-style flat ``state_dict`` -> CMHSE params pytree.

    Args:
      state_dict: flat mapping of dotted names to numpy arrays (torch tensors
        must be converted by the caller — this module never imports torch;
        the ``cmhse-import`` CLI handles ``.pth``/``.npz`` loading).
      hierarchical / reconstruction: which submodules to expect (mirror the
        target :class:`ModelConfig`; attention-pool tensors are detected from
        the keys themselves).
      prefix_map: overrides of :data:`DEFAULT_PREFIX_MAP` for checkpoints
        whose module names differ from the replica naming.
      strict: raise if any checkpoint tensor goes unconsumed (catches silent
        name mismatches — a misspelled prefix would otherwise import a model
        with random weights in one encoder).

    Returns: params dict matching ``CMHSE.init(...)["params"]``'s structure.
    """
    pm = dict(DEFAULT_PREFIX_MAP)
    if prefix_map:
        pm.update(prefix_map)
    sd = dict(state_dict)  # consumed destructively to track leftovers
    params: dict = {
        "word_embedding": embedding_params_from_torch(
            _pop_required(sd, f"{pm['word_embedding']}.weight",
                          pm["word_embedding"])
        ),
        "video_low": _encoder_from_flat(sd, pm["video_low"]),
        "text_low": _encoder_from_flat(sd, pm["text_low"]),
    }
    if hierarchical:
        params["video_high"] = _encoder_from_flat(sd, pm["video_high"])
        params["text_high"] = _encoder_from_flat(sd, pm["text_high"])
    if reconstruction:
        params["video_decoder"] = _decoder_from_flat(sd, pm["video_decoder"])
        params["text_decoder"] = _decoder_from_flat(sd, pm["text_decoder"])
    if strict and sd:
        raise ValueError(
            f"{len(sd)} checkpoint tensors not consumed by the import "
            f"(wrong prefix_map or model flags?): {sorted(sd)[:8]}..."
        )
    return params


def _to_f32_np(a) -> np.ndarray:
    """Param leaf -> float32 numpy (torch has no bfloat16-numpy bridge, and
    reference checkpoints are f32 anyway; integer leaves pass through)."""
    arr = np.asarray(a)
    if np.issubdtype(arr.dtype, np.floating) or arr.dtype.name == "bfloat16":
        arr = arr.astype(np.float32)
    return arr


def _gru_to_torch(gru: dict) -> dict:
    """Inverse of :func:`gru_params_from_torch`: a :class:`MaskedGRU` param
    dict -> torch fused-GRU state_dict tensors ([3H, D], gate order r,z,n),
    with ``*_reverse`` keys when the bwd direction is present."""
    out = {}
    for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
        if f"{direction}_w_i" not in gru:
            continue
        out[f"weight_ih_l0{suffix}"] = np.ascontiguousarray(
            _to_f32_np(gru[f"{direction}_w_i"]).T)
        out[f"weight_hh_l0{suffix}"] = np.ascontiguousarray(
            _to_f32_np(gru[f"{direction}_w_h"]).T)
        out[f"bias_ih_l0{suffix}"] = _to_f32_np(gru[f"{direction}_b_i"])
        out[f"bias_hh_l0{suffix}"] = _to_f32_np(gru[f"{direction}_b_h"])
    return out


def _dense_to_torch(dense: dict) -> dict:
    """Inverse of :func:`dense_params_from_torch`."""
    out = {"weight": np.ascontiguousarray(_to_f32_np(dense["kernel"]).T)}
    if "bias" in dense:
        out["bias"] = _to_f32_np(dense["bias"])
    return out


def _encoder_to_flat(enc: dict, prefix: str, out: dict) -> None:
    """One SequenceEncoder's params -> flat ``{prefix}.gru.*`` (+ proj/attn)
    torch-layout keys, exactly inverting :func:`_encoder_from_flat`."""
    for k, v in _gru_to_torch(enc["gru"]).items():
        out[f"{prefix}.gru.{k}"] = v
    if "proj" in enc:
        for k, v in _dense_to_torch(enc["proj"]).items():
            out[f"{prefix}.proj.{k}"] = v
    if "attn_pool" in enc:
        for k, v in _dense_to_torch(enc["attn_pool"]["proj"]).items():
            out[f"{prefix}.attn_proj.{k}"] = v
        for k, v in _dense_to_torch(enc["attn_pool"]["score"]).items():
            out[f"{prefix}.attn_score.{k}"] = v


def _decoder_to_flat(dec: dict, prefix: str, out: dict) -> None:
    """Inverse of :func:`_decoder_from_flat` (init Linear, teacher-forcing
    GRU, out Linear)."""
    for k, v in _dense_to_torch(dec["init"]).items():
        out[f"{prefix}.init.{k}"] = v
    gru = {"fwd_w_i": dec["w_i"], "fwd_w_h": dec["w_h"],
           "fwd_b_i": dec["b_i"], "fwd_b_h": dec["b_h"]}
    for k, v in _gru_to_torch(gru).items():
        out[f"{prefix}.gru.{k}"] = v
    for k, v in _dense_to_torch(dec["out"]).items():
        out[f"{prefix}.out.{k}"] = v


def state_dict_from_model_params(
    params: dict, prefix_map: dict | None = None
) -> dict:
    """CMHSE params pytree -> a flat reference-style torch state_dict.

    The exact inverse of :func:`model_params_from_state_dict` (round-trip
    pinned by tests/test_export.py), keyed by :data:`DEFAULT_PREFIX_MAP`
    (override via ``prefix_map``). Which submodules exist is read off the
    tree itself (``video_high`` => hierarchical, ``video_decoder`` =>
    reconstruction, a ``bwd_w_i`` => bidirectional ``*_reverse`` keys).
    All float tensors are emitted as contiguous float32 numpy arrays —
    loadable by ``torch.nn.Module.load_state_dict`` after ``torch.from_numpy``
    (the ``cmhse-export`` CLI does this), or re-importable via ``.npz``.
    """
    pm = dict(DEFAULT_PREFIX_MAP)
    if prefix_map:
        pm.update(prefix_map)
    sd: dict = {
        f"{pm['word_embedding']}.weight":
            _to_f32_np(params["word_embedding"]["embedding"]),
    }
    _encoder_to_flat(params["video_low"], pm["video_low"], sd)
    _encoder_to_flat(params["text_low"], pm["text_low"], sd)
    if "video_high" in params:
        _encoder_to_flat(params["video_high"], pm["video_high"], sd)
        _encoder_to_flat(params["text_high"], pm["text_high"], sd)
    if "video_decoder" in params:
        _decoder_to_flat(params["video_decoder"], pm["video_decoder"], sd)
        _decoder_to_flat(params["text_decoder"], pm["text_decoder"], sd)
    return sd


def recon_decoder_params_from_torch(
    init: tuple[np.ndarray, np.ndarray],
    gru_tensors: dict,
    out: tuple[np.ndarray, np.ndarray],
) -> dict:
    """Assemble a :class:`ReconstructionDecoder`'s params from torch tensors
    (``init`` Linear, teacher-forcing GRU, ``out`` Linear)."""
    flat = gru_params_from_torch(
        gru_tensors["weight_ih_l0"], gru_tensors["weight_hh_l0"],
        gru_tensors["bias_ih_l0"], gru_tensors["bias_hh_l0"],
    )
    return {
        "init": dense_params_from_torch(*init),
        "w_i": flat["fwd_w_i"],
        "w_h": flat["fwd_w_h"],
        "b_i": flat["fwd_b_i"],
        "b_h": flat["fwd_b_h"],
        "out": dense_params_from_torch(*out),
    }
