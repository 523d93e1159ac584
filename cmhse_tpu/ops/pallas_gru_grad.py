"""Trainable Pallas GRU: the fused forward time loop of
``cmhse_tpu.ops.pallas_gru`` plus a fused BPTT backward kernel, packaged as a
``jax.custom_vjp`` with the same signature as
:func:`cmhse_tpu.models.gru.gru_sequence` (zero initial state).

Backward design (what cuDNN's GRU backward does, tuned for the v5e memory
system with a measured op-level profile):

  * the forward (when running under ``jax.grad``) uses the gate-SAVING
    variant of the forward kernel: ``[r, z, n, hn]`` stream to HBM in the
    compute dtype as a time-major ``[T, B, 4H]`` tensor. That write is DMA
    that hides under the forward's MXU time; in exchange the backward needs
    NO gate recompute — profiling showed the recompute GEMM was half the
    backward kernel's MXU time, and the ``x @ W_i`` recompute feeding it
    another ~0.8 ms/step at the flagship train shape;
  * the backward time loop runs REVERSED on a (batch-chunk, T) grid; the
    carried state gradient ``dh`` lives in VMEM scratch; the recurrent
    weights stay pinned in VMEM for the one remaining per-step GEMM
    (``dhw @ W_h^T``);
  * the kernel emits the input-side gate gradients ``dxw`` = (dr', dz', dn')
    and the hidden-side n-slot gradient ``dhn`` separately — so the
    downstream weight-gradient GEMMs consume them WITHOUT materializing the
    full hidden-side ``dhw`` (the previous slice+concat cost ~0.4 ms/step);
  * gradients stream in the compute dtype (bf16 for mixed-precision
    training, f32 for the exact-parity path); accumulations are f32;
  * masked steps (t >= length) pass ``dh`` straight through and contribute
    zero gate gradients, matching the forward's carry-through masking.

Gradient parity vs ``jax.grad`` of the scan implementation is pinned in
tests/test_pallas_gru_grad.py (exact at f32; banded under bf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmhse_tpu.ops.pallas_gru import _use_interpret, pallas_gru_sequence

# Batch-chunk rows per backward grid step. MUST mirror the gate-saving
# forward's chunk caps (pallas_gru._TB // 2 per dtype) so the padded gates
# tensor from the forward streams into the backward without a slice/re-pad.
_TB_BWD = {jnp.dtype(jnp.bfloat16): 128}
_TB_BWD_DEFAULT = 64  # f32: W_h alone is 12.6 MB in VMEM; halve the chunk


def _gru_bwd_kernel(
    len_ref, wh_ref, gates_ref, hprev_ref, douts_ref,
    dxw_ref, dhn_ref, dh_scratch,
):
    tt = pl.program_id(1)
    n_t = pl.num_programs(1)
    t = n_t - 1 - tt  # walk time backwards

    @pl.when(tt == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)

    hidden = dh_scratch.shape[-1]
    wdtype = wh_ref.dtype

    dh = dh_scratch[:] + douts_ref[0].astype(jnp.float32)  # (TB, H)
    h_prev = hprev_ref[0].astype(jnp.float32)  # (TB, H)

    g = gates_ref[0].astype(jnp.float32)  # (TB, 4H) saved by the forward
    r = g[:, :hidden]
    z = g[:, hidden : 2 * hidden]
    n = g[:, 2 * hidden : 3 * hidden]
    hn = g[:, 3 * hidden :]

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
    dhn_ref[0] = dhn.astype(dhn_ref.dtype)
    dh_scratch[:] = dh_prev


def _gru_bwd_pallas(gates, h_prev_seq, douts, lengths, w_h):
    """Run the backward kernel.

    Args:
      gates: ``[T, B_padded, 4H]`` raw padded time-major gates from the
        gate-saving forward (compute dtype).
      h_prev_seq: ``[B, T, H]`` previous-state sequence (outs shifted by 1).
      douts: ``[B, T, H]`` f32 output cotangents.
      lengths / w_h: as in the forward.

    Returns ``(dxw [B,T,3H], dhn [B,T,H])`` in the compute dtype (bf16 under
    mixed precision, f32 otherwise); accumulating consumers upcast.
    """
    b, t, hdim = h_prev_seq.shape
    dtype = h_prev_seq.dtype
    out_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32

    hprev_t = jnp.swapaxes(h_prev_seq, 0, 1)  # [T, B, H]
    douts_t = jnp.swapaxes(douts, 0, 1)  # [T, B, H]

    # multiple of 8 for Mosaic sublane tiling; padding absorbs excess rows.
    # The cap mirrors the gate-saving forward so `gates` needs no re-pad.
    cap = _TB_BWD.get(jnp.dtype(dtype), _TB_BWD_DEFAULT)
    tb = min(cap, max(8, -(-b // 8) * 8))
    pad = (-b) % tb
    if pad:
        hprev_t = jnp.pad(hprev_t, ((0, 0), (0, pad), (0, 0)))
        douts_t = jnp.pad(douts_t, ((0, 0), (0, pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
    bp = b + pad
    if gates.shape[1] != bp:
        # fallback for mismatched forward padding (different chunk caps);
        # slicing costs a copy, so the caps above are kept in sync instead
        gates = gates[:, :b]
        if pad:
            gates = jnp.pad(gates, ((0, 0), (0, pad), (0, 0)))
    n_chunks = bp // tb

    wdtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    wh = w_h.astype(wdtype)
    len2 = lengths.astype(jnp.int32)[:, None]

    rev = lambda c, tt: (pl.num_programs(1) - 1 - tt, c, 0)
    dxw, dhn = pl.pallas_call(
        _gru_bwd_kernel,
        grid=(n_chunks, t),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda c, tt: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, 3 * hdim), lambda c, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, 4 * hdim), rev, memory_space=pltpu.VMEM),
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
            flops=2 * bp * t * hdim * 3 * hdim,
            bytes_accessed=bp * t * hdim * 9 * 2,
            transcendentals=0,
        ),
    )(len2, wh, gates, hprev_t, douts_t)

    return (
        jnp.swapaxes(dxw, 0, 1)[:b],
        jnp.swapaxes(dhn, 0, 1)[:b],
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
    outs, final, gates = pallas_gru_sequence(
        x, lengths, w_i, w_h, b_i, b_h, save_gates=True
    )
    return (outs, final), (x, lengths, w_i, w_h, b_i, b_h, outs, gates)


def _bwd(residuals, grads):
    x, lengths, w_i, w_h, b_i, b_h, outs, gates = residuals
    douts, dfinal = grads
    b, t, _ = x.shape
    hdim = w_h.shape[0]

    # final == outs[:, -1] (masked steps carry), so d_final folds into the
    # last step's output gradient
    douts = douts.astype(jnp.float32)
    douts = douts.at[:, -1].add(dfinal.astype(jnp.float32))

    h_prev_seq = jnp.concatenate(
        [jnp.zeros((b, 1, hdim), outs.dtype), outs[:, :-1]], axis=1
    )

    dxw, dhn = _gru_bwd_pallas(gates, h_prev_seq, douts, lengths, w_h)

    # Weight grads: large MXU GEMMs with f32 accumulation, operands in the
    # compute dtype (bf16 multiplies are XLA's default for f32 dots on TPU
    # anyway). The hidden-side dhw differs from dxw only in the n slot, so
    # its GEMM/sums are built from (dxw[..., :2H], dhn) pieces without ever
    # materializing a concatenated [B,T,3H] dhw.
    dxw_rz = dxw[..., : 2 * hdim]
    dW_h = jnp.concatenate(
        [
            jnp.einsum("bth,btk->hk", h_prev_seq, dxw_rz,
                       preferred_element_type=jnp.float32),
            jnp.einsum("bth,btk->hk", h_prev_seq, dhn,
                       preferred_element_type=jnp.float32),
        ],
        axis=1,
    )
    db_h = jnp.concatenate(
        [
            jnp.sum(dxw_rz, axis=(0, 1), dtype=jnp.float32),
            jnp.sum(dhn, axis=(0, 1), dtype=jnp.float32),
        ]
    )
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
        db_i.astype(b_i.dtype),
        db_h.astype(b_h.dtype),
    )


pallas_gru_trainable.defvjp(_fwd, _bwd)
