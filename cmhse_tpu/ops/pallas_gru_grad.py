"""Trainable Pallas GRU: the fused forward time loop of
``cmhse_tpu.ops.pallas_gru`` plus a fused BPTT backward kernel, packaged as a
``jax.custom_vjp`` with the same signature as
:func:`cmhse_tpu.models.gru.gru_sequence` (zero initial state).

Backward design (mirrors what cuDNN's GRU backward does):
  * the time loop runs REVERSED on a (batch-chunk, T) grid; the carried
    state gradient ``dh`` lives in VMEM scratch, the recurrent weights stay
    pinned in VMEM;
  * gates are recomputed from the saved per-step states (checkpoint-free
    recompute: one extra [TB, H] x [H, 3H] GEMM per step — cheaper than
    streaming 3 gate tensors through HBM);
  * the kernel emits per-step input-side gate gradients ``dxw`` and the
    reset gate ``r``; the weight gradients are then TWO large MXU GEMMs
    outside the kernel (``dW_h = h_prev^T @ dhw``, ``dW_i = x^T @ dxw``)
    instead of per-step accumulators that would not fit VMEM next to W_h;
  * masked steps (t >= length) pass ``dh`` straight through and contribute
    zero gate gradients, matching the forward's carry-through masking.

Gradient parity vs ``jax.grad`` of the scan implementation is pinned in
tests/test_pallas_gru_grad.py (exact at f32; in bf16 the recomputed gates see
the bf16-rounded saved states where the forward's VMEM carry was f32, adding
~1e-2 relative gate error — the same trade cuDNN makes, and well under the
noise floor of bf16 training).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmhse_tpu.ops.pallas_gru import _use_interpret, pallas_gru_sequence

_TB_BWD = 128  # batch-chunk rows per backward grid step


def _gru_bwd_kernel(
    len_ref, wh_ref, bh_ref, xw_ref, hprev_ref, douts_ref,
    dxw_ref, r_ref, dh_scratch,
):
    c = pl.program_id(0)
    tt = pl.program_id(1)
    n_t = pl.num_programs(1)
    t = n_t - 1 - tt  # walk time backwards
    del c

    @pl.when(tt == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)

    hidden = dh_scratch.shape[-1]
    wdtype = wh_ref.dtype

    dh = dh_scratch[:] + douts_ref[0].astype(jnp.float32)  # (TB, H)
    h_prev = hprev_ref[0].astype(jnp.float32)  # (TB, H)

    # recompute the forward gates for this step
    hw = jnp.dot(
        h_prev.astype(wdtype), wh_ref[:], preferred_element_type=jnp.float32
    ) + bh_ref[0, :][None, :]
    xw = xw_ref[0].astype(jnp.float32)
    xr = xw[:, :hidden]
    xz = xw[:, hidden : 2 * hidden]
    xn = xw[:, 2 * hidden :]
    hr = hw[:, :hidden]
    hz = hw[:, hidden : 2 * hidden]
    hn = hw[:, 2 * hidden :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)

    # gate gradients (h_t = (1-z) n + z h_prev)
    dn = dh * (1.0 - z)
    dz = dh * (h_prev - n)
    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * hn
    dhn = dn_pre * r
    dz_pre = dz * z * (1.0 - z)
    dr_pre = dr * r * (1.0 - r)

    keep = t < len_ref[:]  # (TB, 1) bool
    zero = jnp.zeros_like(dr_pre)
    dr_pre = jnp.where(keep, dr_pre, zero)
    dz_pre = jnp.where(keep, dz_pre, zero)
    dn_pre = jnp.where(keep, dn_pre, zero)
    dhn = jnp.where(keep, dhn, zero)

    dxw = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)  # (TB, 3H)
    dhw = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)

    # dh_prev = [keep] dh*z + dhw @ W_h^T   |   [pass-through] dh
    dh_prev_live = dh * z + jax.lax.dot_general(
        dhw.astype(wdtype), wh_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh_prev = jnp.where(keep, dh_prev_live, dh)

    dxw_ref[0] = dxw.astype(dxw_ref.dtype)
    r_ref[0] = jnp.where(keep, r, zero).astype(r_ref.dtype)
    dh_scratch[:] = dh_prev


def _gru_bwd_pallas(xw, h_prev_seq, douts, lengths, w_h, b_h):
    """Run the backward kernel: returns (dxw [B,T,3H], r [B,T,H]).

    Output dtype matches the compute dtype: f32 inputs get exact f32 gate
    gradients (pinned exactly vs autodiff in tests); bf16 inputs get bf16
    outputs — the downstream weight-gradient GEMMs multiply in bf16 on the
    MXU either way (XLA default precision), so storing f32 would only double
    the HBM traffic of the [B,T,3H] tensor (the measured bottleneck of the
    backward: the dW leg ran at ~100 TFLOP/s effective vs ~190 for the rest),
    not improve the product precision. Accumulations (dW, db) stay f32 via
    preferred_element_type / sum dtype.
    """
    b, t, three_h = xw.shape
    hdim = three_h // 3
    dtype = xw.dtype
    out_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32

    xw_t = jnp.swapaxes(xw, 0, 1)  # [T, B, 3H]
    hprev_t = jnp.swapaxes(h_prev_seq, 0, 1)  # [T, B, H]
    douts_t = jnp.swapaxes(douts, 0, 1)  # [T, B, H]

    # multiple of 8 for Mosaic sublane tiling; padding absorbs excess rows
    tb = min(_TB_BWD, max(8, -(-b // 8) * 8))
    pad = (-b) % tb
    if pad:
        xw_t = jnp.pad(xw_t, ((0, 0), (0, pad), (0, 0)))
        hprev_t = jnp.pad(hprev_t, ((0, 0), (0, pad), (0, 0)))
        douts_t = jnp.pad(douts_t, ((0, 0), (0, pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
    bp = b + pad
    n_chunks = bp // tb

    wdtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    wh = w_h.astype(wdtype)
    bh2 = b_h.astype(jnp.float32)[None, :]
    len2 = lengths.astype(jnp.int32)[:, None]

    rev = lambda c, tt: (pl.num_programs(1) - 1 - tt, c, 0)
    dxw, r = pl.pallas_call(
        _gru_bwd_kernel,
        grid=(n_chunks, t),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda c, tt: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, 3 * hdim), lambda c, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hdim), lambda c, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, 3 * hdim), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, hdim), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, hdim), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tb, 3 * hdim), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, hdim), rev, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, bp, 3 * hdim), out_dtype),
            jax.ShapeDtypeStruct((t, bp, hdim), out_dtype),
        ),
        scratch_shapes=[pltpu.VMEM((tb, hdim), jnp.float32)],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * t * hdim * 3 * hdim,
            bytes_accessed=bp * t * hdim * 8 * 4,
            transcendentals=bp * t * 3 * hdim,
        ),
    )(len2, wh, bh2, xw_t, hprev_t, douts_t)

    return (
        jnp.swapaxes(dxw, 0, 1)[:b],
        jnp.swapaxes(r, 0, 1)[:b],
    )


@jax.custom_vjp
def pallas_gru_trainable(
    x: Array,
    lengths: Array,
    w_i: Array,
    w_h: Array,
    b_i: Array,
    b_h: Array,
) -> tuple[Array, Array]:
    """Drop-in for :func:`cmhse_tpu.models.gru.gru_sequence` (zero h0) with
    BOTH directions of the time loop as fused Pallas kernels."""
    return pallas_gru_sequence(x, lengths, w_i, w_h, b_i, b_h)


def _fwd(x, lengths, w_i, w_h, b_i, b_h):
    outs, final = pallas_gru_sequence(x, lengths, w_i, w_h, b_i, b_h)
    return (outs, final), (x, lengths, w_i, w_h, b_i, b_h, outs)


def _bwd(residuals, grads):
    x, lengths, w_i, w_h, b_i, b_h, outs = residuals
    douts, dfinal = grads
    b, t, _ = x.shape
    hdim = w_h.shape[0]
    dtype = x.dtype

    # final == outs[:, -1] (masked steps carry), so d_final folds into the
    # last step's output gradient
    douts = douts.astype(jnp.float32)
    douts = douts.at[:, -1].add(dfinal.astype(jnp.float32))

    # recompute the (cheap, one-GEMM) input projection the forward used
    xw = (
        jnp.dot(x, w_i.astype(dtype), preferred_element_type=jnp.float32)
        + b_i
    ).astype(dtype)
    h_prev_seq = jnp.concatenate(
        [jnp.zeros((b, 1, hdim), outs.dtype), outs[:, :-1]], axis=1
    )

    dxw, r = _gru_bwd_pallas(xw, h_prev_seq, douts, lengths, w_h, b_h)

    # hidden-side gate grads differ from dxw only in the n slot
    dhw = jnp.concatenate(
        [dxw[..., : 2 * hdim], dxw[..., 2 * hdim :] * r], axis=-1
    )

    # Weight grads: two large MXU GEMMs with f32 accumulation. Operands stay
    # in their native dtype (bf16 in mixed-precision training) — XLA's
    # default f32 matmul already multiplies in bf16 on TPU, so f32 copies of
    # the [B,T,*] tensors only added HBM traffic, which dominated the
    # backward (measured: this leg at ~100 TFLOP/s effective vs ~190 for the
    # kernel+dx leg before the change).
    dW_h = jnp.einsum(
        "bth,btk->hk", h_prev_seq, dhw, preferred_element_type=jnp.float32
    )
    db_h = jnp.sum(dhw, axis=(0, 1), dtype=jnp.float32)
    dW_i = jnp.einsum(
        "btd,btk->dk", x, dxw, preferred_element_type=jnp.float32
    )
    db_i = jnp.sum(dxw, axis=(0, 1), dtype=jnp.float32)
    dx = jnp.dot(
        dxw, w_i.astype(dxw.dtype).T, preferred_element_type=jnp.float32
    ).astype(x.dtype)

    return (
        dx,
        None,  # lengths
        dW_i.astype(w_i.dtype),
        dW_h.astype(w_h.dtype),
        db_i.astype(b_h.dtype),
        db_h.astype(b_h.dtype),
    )


pallas_gru_trainable.defvjp(_fwd, _bwd)
