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
