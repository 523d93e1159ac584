"""Masked ``lax.scan`` GRU — the TPU-native replacement for the reference's
cuDNN ``nn.GRU`` over packed variable-length sequences (SURVEY.md section 2a).

Numerics contract (SURVEY.md "hard parts" item 1 — gates the "reproduces its
embeddings" goal):
  * gate equations and ordering match ``torch.nn.GRU`` exactly:
        r_t = sigmoid(x_t W_ir + b_ir + h_{t-1} W_hr + b_hr)
        z_t = sigmoid(x_t W_iz + b_iz + h_{t-1} W_hz + b_hz)
        n_t = tanh  (x_t W_in + b_in + r_t * (h_{t-1} W_hn + b_hn))
        h_t = (1 - z_t) * n_t + z_t * h_{t-1}
    with the fused weight laid out gate-major in (r, z, n) order, so a
    PyTorch ``weight_ih_l0`` of shape ``[3H, D]`` transposes directly into our
    ``w_i`` of shape ``[D, 3H]``;
  * the final state is the state at the TRUE length, not the padded length:
    steps with ``t >= length`` carry ``h_{t-1}`` through unchanged, which is
    exactly what ``pack_padded_sequence`` + cuDNN produced. The reference's
    sort-by-length collate existed only to satisfy cuDNN and is NOT
    replicated (SURVEY.md section 3.3).

TPU-first structure: the input projection ``x @ W_i`` for ALL timesteps is
hoisted out of the scan into one large MXU GEMM ``[B*T, D] @ [D, 3H]``; the
scan body is a single ``[B, H] @ [H, 3H]`` GEMM plus VPU elementwise — the
minimal sequential work a GRU admits.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import Array


def gru_input_projection(x: Array, w_i: Array, b_i: Array) -> Array:
    """One fused MXU GEMM for every timestep's input transform.

    Args:
      x: ``[B, T, D]`` inputs.
      w_i: ``[D, 3H]`` fused input weights, gate order (r, z, n).
      b_i: ``[3H]`` fused input bias.

    Returns: ``[B, T, 3H]``.
    """
    # cast weights to the activation dtype so bf16 activations hit the MXU's
    # bf16 x bf16 -> f32 fast path (identity for f32 training/parity runs)
    return (
        jnp.dot(x, w_i.astype(x.dtype), preferred_element_type=jnp.float32)
        + b_i
    ).astype(x.dtype)


def gru_step(xw_t: Array, h: Array, w_h: Array, b_h: Array) -> Array:
    """One GRU step given a precomputed input projection.

    Args:
      xw_t: ``[B, 3H]`` = x_t @ W_i + b_i.
      h: ``[B, H]`` previous state.
      w_h: ``[H, 3H]`` fused hidden weights, gate order (r, z, n).
      b_h: ``[3H]`` fused hidden bias.
    """
    hw = (
        jnp.dot(h, w_h.astype(h.dtype), preferred_element_type=jnp.float32)
        + b_h
    )  # [B, 3H] f32
    xr, xz, xn = jnp.split(xw_t.astype(jnp.float32), 3, axis=-1)
    hr, hz, hn = jnp.split(hw, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return ((1.0 - z) * n + z * h.astype(jnp.float32)).astype(h.dtype)


def gru_sequence(
    x: Array,
    lengths: Array,
    w_i: Array,
    w_h: Array,
    b_i: Array,
    b_h: Array,
    h0: Array | None = None,
    unroll: int = 2,
) -> tuple[Array, Array]:
    """Run a masked GRU over padded sequences.

    Args:
      x: ``[B, T, D]`` padded inputs.
      lengths: ``[B]`` int true lengths (0 allowed => final state == h0).
      w_i / w_h / b_i / b_h: fused parameters, gate order (r, z, n).
      h0: optional ``[B, H]`` initial state (zeros by default).
      unroll: scan unroll factor (amortizes per-step overhead on TPU).

    Returns:
      outputs: ``[B, T, H]`` per-step states; padded steps hold the carried
        state (mask externally before pooling over time).
      final: ``[B, H]`` state at each row's true length.
    """
    b, t, _ = x.shape
    hdim = w_h.shape[0]
    if h0 is None:
        h0 = jnp.zeros((b, hdim), dtype=x.dtype)

    xw = gru_input_projection(x, w_i, b_i)  # [B, T, 3H]
    xw_t_major = jnp.swapaxes(xw, 0, 1)  # [T, B, 3H] for scan

    step_idx = jnp.arange(t)

    def body(h, inp):
        xw_t, tt = inp
        h_new = gru_step(xw_t, h, w_h, b_h)
        keep = (tt < lengths)[:, None]  # [B, 1]
        h_out = jnp.where(keep, h_new, h)
        return h_out, h_out

    final, outs = jax.lax.scan(body, h0, (xw_t_major, step_idx), unroll=unroll)
    return jnp.swapaxes(outs, 0, 1), final


def flip_padded(x: Array, lengths: Array) -> Array:
    """Reverse each row's valid prefix in place, leaving padding at the tail.

    Used for the backward direction of a bidirectional GRU over padded
    sequences: ``[a b c PAD PAD] -> [c b a PAD PAD]``.
    """
    b, t = x.shape[0], x.shape[1]
    pos = jnp.arange(t)[None, :]  # [1, T]
    src = jnp.where(pos < lengths[:, None], lengths[:, None] - 1 - pos, pos)
    return jnp.take_along_axis(
        x, src.reshape(b, t, *([1] * (x.ndim - 2))), axis=1
    )


class MaskedGRU(nn.Module):
    """Flax module wrapping :func:`gru_sequence`; optionally bidirectional.

    Parameter init is uniform(-1/sqrt(H), 1/sqrt(H)) matching PyTorch's GRU
    reset_parameters, so distributional behavior matches the reference.
    """

    features: int
    bidirectional: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # fused Pallas time loop with a fused BPTT custom VJP (see
    # ops/pallas_gru.py + ops/pallas_gru_grad.py); usable for training
    use_pallas: bool = False

    def _direction_params(self, name: str, in_dim: int):
        h = self.features
        scale = 1.0 / jnp.sqrt(jnp.float32(h))
        init = lambda key, shape, dtype: jax.random.uniform(
            key, shape, dtype, -scale, scale
        )
        w_i = self.param(f"{name}_w_i", init, (in_dim, 3 * h), self.param_dtype)
        w_h = self.param(f"{name}_w_h", init, (h, 3 * h), self.param_dtype)
        b_i = self.param(f"{name}_b_i", init, (3 * h,), self.param_dtype)
        b_h = self.param(f"{name}_b_h", init, (3 * h,), self.param_dtype)
        return w_i, w_h, b_i, b_h

    @nn.compact
    def __call__(self, x: Array, lengths: Array) -> tuple[Array, Array]:
        """Returns (outputs ``[B, T, H]`` or ``[B, T, 2H]``, final ``[B, H]``
        or ``[B, 2H]``)."""
        in_dim = x.shape[-1]
        x = x.astype(self.dtype)
        if self.use_pallas:
            # custom-VJP wrapper: fused Pallas time loop in BOTH directions,
            # so this path is valid for training as well as encode
            from cmhse_tpu.ops.pallas_gru_grad import (
                pallas_gru_trainable as seq_fn,
            )
        else:
            seq_fn = gru_sequence
        w_i, w_h, b_i, b_h = self._direction_params("fwd", in_dim)
        outs_f, final_f = seq_fn(x, lengths, w_i, w_h, b_i, b_h)
        if not self.bidirectional:
            return outs_f, final_f
        w_i, w_h, b_i, b_h = self._direction_params("bwd", in_dim)
        x_rev = flip_padded(x, lengths)
        outs_b, final_b = seq_fn(x_rev, lengths, w_i, w_h, b_i, b_h)
        outs_b = flip_padded(outs_b, lengths)
        return (
            jnp.concatenate([outs_f, outs_b], axis=-1),
            jnp.concatenate([final_f, final_b], axis=-1),
        )


def masked_mean(outputs: Array, lengths: Array) -> Array:
    """Mean over valid timesteps of ``[B, T, H]`` -> ``[B, H]``."""
    t = outputs.shape[1]
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(outputs.dtype)
    summed = jnp.sum(outputs * mask[:, :, None], axis=1)
    denom = jnp.maximum(lengths.astype(outputs.dtype), 1.0)[:, None]
    return summed / denom
