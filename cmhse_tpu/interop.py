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
    emb = state_dict[f"{pm['word_embedding']}.weight"]
    w_ih = state_dict[f"{pm['video_low']}.gru.weight_ih_l0"]
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
            sd.pop(f"{pm['word_embedding']}.weight")
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
