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
  * everything around the kernel is stream-shaped so NO host-graph copy
    sits on the path: ``h_prev`` comes straight from the forward's raw
    time-major outputs via a shifted block index map (zeros at t=0 handled
    in-kernel — no shift/pad materialization); ``douts`` streams b-major in
    the compute dtype (no f32 convert) with ``dfinal`` folded in at the
    last step in-kernel (the final state's cotangent legitimately enters at
    t = T-1: masked steps pass ``dh`` through, so it reaches the true
    length); the bias gradients accumulate in a VMEM scratch and leave as
    tiny per-chunk partials instead of re-reading the [B,T,3H] gradient
    stream;
  * the kernel emits the input-side gate gradients ``dxw`` = (dr', dz',
    dn') and the hidden-side n-slot gradient ``dhn`` separately, so the
    downstream weight-gradient GEMMs consume them without materializing a
    concatenated hidden-side ``dhw``; the ``dW_h`` GEMMs pair them against
    the raw time-major forward outputs shifted by one step in the einsum
    itself (major-dim slices — no h_prev copy);
  * gradients stream in the compute dtype (bf16 for mixed-precision
    training, f32 for the exact-parity path); accumulations are f32;
  * masked steps (t >= length) pass ``dh`` straight through and contribute
    zero gate gradients, matching the forward's carry-through masking.

Gradient parity vs ``jax.grad`` of the scan implementation is pinned in
tests/test_pallas_gru_grad.py (exact at f32; banded under bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmhse_tpu.ops.pallas_gru import _TB, _use_interpret, pallas_gru_sequence


def _bwd_chunk_cap(dtype) -> int:
    """Batch-chunk rows per backward grid step — DERIVED from the forward's
    ``pallas_gru._TB`` so the gate-saving forward and the backward always
    pad the batch identically and the padded gates / outs tensors stream
    between the two kernels without a slice/re-pad (the fallback in
    ``_gru_bwd_pallas`` covers a divergence but costs a copy). Mirrors the
    ``save_gates`` branch of ``pallas_gru_sequence``: bf16 _TB//2; f32
    _TB//4 (W_h alone is 12.6 MB of VMEM in f32; halve the chunk again).
    """
    return _TB // 2 if jnp.dtype(dtype) == jnp.bfloat16 else _TB // 4


def _gru_bwd_kernel(*refs, with_h0: bool):
    if with_h0:
        (len_ref, wh_ref, gates_ref, hprev_ref, douts_ref, dfinal_ref,
         h0_ref, dxw_ref, dhn_ref, db_ref, dh0_ref,
         dh_scratch, db_scratch) = refs
    else:
        (len_ref, wh_ref, gates_ref, hprev_ref, douts_ref, dfinal_ref,
         dxw_ref, dhn_ref, db_ref, dh_scratch, db_scratch) = refs
        h0_ref = dh0_ref = None
    tt = pl.program_id(1)
    n_t = pl.num_programs(1)
    t = n_t - 1 - tt  # walk time backwards

    @pl.when(tt == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)
        db_scratch[:] = jnp.zeros_like(db_scratch)

    hidden = dh_scratch.shape[-1]
    wdtype = wh_ref.dtype

    dh = dh_scratch[:] + douts_ref[0].astype(jnp.float32)  # (TB, H)
    # the final state's cotangent enters at the last step and rides the
    # pass-through masking back to each row's true length
    dh = dh + jnp.where(tt == 0, dfinal_ref[:].astype(jnp.float32), 0.0)
    # h_prev streams from the forward outputs shifted by one step; t=0 reads
    # a dummy block (index map clamps) and uses the true initial state
    # (zeros, or the caller's h0 in the seeded variant)
    h_at_0 = (jnp.zeros((dh.shape[0], hidden), jnp.float32)
              if h0_ref is None else h0_ref[:].astype(jnp.float32))
    h_prev = jnp.where(t == 0, h_at_0, hprev_ref[0].astype(jnp.float32))

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

    # bias-gradient partials: accumulate row sums here — the [B,T,3H]
    # stream is in VMEM anyway, re-reading it from HBM for the sums costs
    # ~0.45 ms/step at the flagship shape. Partially reduced to 8 sublane
    # rows (not 1) because Mosaic requires >=8-sublane output tiles; the
    # final 8-row fold happens outside the kernel.
    tb_rows = dxw.shape[0]
    db_scratch[:] = db_scratch[:] + jnp.concatenate(
        [
            jnp.sum(dxw.reshape(8, tb_rows // 8, -1), axis=1),
            jnp.sum(dhn.reshape(8, tb_rows // 8, -1), axis=1),
        ],
        axis=1,
    )

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

    @pl.when(tt == n_t - 1)
    def _():
        db_ref[0] = db_scratch[:]
        if dh0_ref is not None:
            # gradient w.r.t. the seeded initial state: the carry gradient
            # after the t=0 step (flows to the decoder's init projection)
            dh0_ref[:] = dh_prev.astype(dh0_ref.dtype)


def _gru_bwd_pallas(gates, outs_raw, douts, dfinal, lengths, w_h, h0=None):
    """Run the backward kernel.

    Args:
      gates: ``[T, Bp, 4H]`` raw padded time-major gates from the
        gate-saving forward (compute dtype).
      outs_raw: ``[T, Bp, H]`` raw padded time-major forward outputs (the
        h_prev source, streamed shifted by one step).
      douts: ``[B, T, H]`` output cotangents (compute dtype).
      dfinal: ``[B, H]`` final-state cotangent (compute dtype).
      lengths / w_h: as in the forward.

    Returns ``(dxw [T,Bp,3H], dhn [T,Bp,H], db [4H] f32, outs_raw)`` — the
    gradient streams TIME-MAJOR (matching the kernel's walk; downstream
    transposes are layout bitcasts) and still batch-padded (padded rows are
    exactly zero: their lengths are 0 so every step masks); ``db`` columns
    are the summed (dr', dz', dn', dhn) slots. ``outs_raw`` is returned
    with the SAME batch padding as the gradient streams (it is re-padded
    here iff the forward's chunk cap diverged), so the caller's dW_h
    einsums can pair them directly.
    """
    b, t, hdim = douts.shape
    dtype = douts.dtype
    out_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32

    douts_t = jnp.swapaxes(douts, 0, 1)  # [T, B, H] (layout bitcast)

    # multiple of 8 for Mosaic sublane tiling; padding absorbs excess rows.
    # The cap mirrors the gate-saving forward so `gates`/`outs_raw` need no
    # re-pad.
    cap = _bwd_chunk_cap(dtype)
    tb = min(cap, max(8, -(-b // 8) * 8))
    pad = (-b) % tb
    if pad:
        douts_t = jnp.pad(douts_t, ((0, 0), (0, pad), (0, 0)))
        dfinal = jnp.pad(dfinal, ((0, pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
        if h0 is not None:
            h0 = jnp.pad(h0, ((0, pad), (0, 0)))
    bp = b + pad
    if gates.shape[1] != bp:
        # fallback for mismatched forward padding (different chunk caps);
        # slicing costs a copy, so the caps above are kept in sync instead
        gates = gates[:, :b]
        outs_raw = outs_raw[:, :b]
        if pad:
            gates = jnp.pad(gates, ((0, 0), (0, pad), (0, 0)))
            outs_raw = jnp.pad(outs_raw, ((0, 0), (0, pad), (0, 0)))
    n_chunks = bp // tb

    wdtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    wh = w_h.astype(wdtype)
    len2 = lengths.astype(jnp.int32)[:, None]

    rev_t = lambda c, tt: (t - 1 - tt, c, 0)  # time-major streams
    # h_prev: block t-1; clamped at t=0 where the kernel substitutes zeros
    shift = lambda c, tt: (jnp.maximum(t - 2 - tt, 0), c, 0)

    in_specs = [
        pl.BlockSpec((tb, 1), lambda c, tt: (c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hdim, 3 * hdim), lambda c, tt: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, 4 * hdim), rev_t, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, hdim), shift, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, hdim), rev_t, memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, hdim), lambda c, tt: (c, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, tb, 3 * hdim), rev_t, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, hdim), rev_t, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 4 * hdim), lambda c, tt: (c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, bp, 3 * hdim), out_dtype),
        jax.ShapeDtypeStruct((t, bp, hdim), out_dtype),
        jax.ShapeDtypeStruct((n_chunks, 8, 4 * hdim), jnp.float32),
    ]
    operands = [len2, wh, gates, outs_raw, douts_t, dfinal]
    if h0 is not None:
        in_specs.append(pl.BlockSpec((tb, hdim), lambda c, tt: (c, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(h0.astype(dtype))
        out_specs.append(pl.BlockSpec((tb, hdim), lambda c, tt: (c, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bp, hdim), out_dtype))

    results = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, with_h0=h0 is not None),
        grid=(n_chunks, t),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((tb, hdim), jnp.float32),
            pltpu.VMEM((8, 4 * hdim), jnp.float32),
        ],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * t * hdim * 3 * hdim,
            bytes_accessed=bp * t * hdim * 9 * 2,
            transcendentals=0,
        ),
    )(*operands)
    dxw, dhn, db = results[0], results[1], results[2]
    dh0 = results[3] if h0 is not None else None
    return dxw, dhn, jnp.sum(db, axis=(0, 1)), outs_raw, dh0


def pallas_gru_trainable(
    x: Array,
    lengths: Array,
    w_i: Array,
    w_h: Array,
    b_i: Array,
    b_h: Array,
    h0: Array | None = None,
) -> tuple[Array, Array]:
    """Drop-in for :func:`cmhse_tpu.models.gru.gru_sequence` with BOTH
    directions of the time loop as fused Pallas kernels. ``h0`` seeds the
    carry (the reconstruction decoder's projected high-level embedding) and
    receives a gradient; None keeps the zero-h0 fast path unchanged."""
    if h0 is None:
        return _gru_trainable_zero(x, lengths, w_i, w_h, b_i, b_h)
    return _gru_trainable_h0(x, lengths, w_i, w_h, b_i, b_h, h0)


@jax.custom_vjp
def _gru_trainable_zero(x, lengths, w_i, w_h, b_i, b_h):
    return pallas_gru_sequence(x, lengths, w_i, w_h, b_i, b_h)


def _fwd(x, lengths, w_i, w_h, b_i, b_h):
    outs, final, gates, outs_raw = pallas_gru_sequence(
        x, lengths, w_i, w_h, b_i, b_h, save_gates=True
    )
    res = (x, lengths, w_i, w_h, b_i, b_h, gates, outs_raw)
    return (outs, final), res


def _bwd(residuals, grads):
    x, lengths, w_i, w_h, b_i, b_h, gates, outs_raw = residuals
    douts, dfinal = grads
    b, t, _ = x.shape
    hdim = w_h.shape[0]

    dxw, dhn, db, outs_raw, _ = _gru_bwd_pallas(
        gates, outs_raw, douts.astype(x.dtype), dfinal.astype(x.dtype),
        lengths, w_h,
    )

    # Weight grads: large MXU GEMMs with f32 accumulation, operands in the
    # compute dtype (bf16 multiplies are XLA's default for f32 dots on TPU
    # anyway). The hidden-side dhw differs from dxw only in the n slot, so
    # its GEMMs pair (dxw[..., :2H], dhn) pieces against the SHIFTED raw
    # forward outputs — never materializing a concatenated dhw or an
    # h_prev copy: h_prev[t] = outs_raw[t-1] for t>=1 and the t=0 term is
    # zero, i.e. einsum(outs_raw[:-1], grad_stream[:, 1:]). Batch-padded
    # rows are zero on both sides.
    dW_h = jnp.concatenate(
        [
            jnp.einsum("tbh,tbk->hk", outs_raw[: t - 1],
                       dxw[1:, :, : 2 * hdim],
                       preferred_element_type=jnp.float32),
            jnp.einsum("tbh,tbk->hk", outs_raw[: t - 1], dhn[1:],
                       preferred_element_type=jnp.float32),
        ],
        axis=1,
    )
    db_h = jnp.concatenate([db[: 2 * hdim], db[3 * hdim :]])
    dxw_bt = jnp.swapaxes(dxw, 0, 1)[:b]  # [B, T, 3H] (layout bitcast)
    dW_i = jnp.einsum(
        "btd,btk->dk", x, dxw_bt, preferred_element_type=jnp.float32
    )
    db_i = db[: 3 * hdim]
    dx = jnp.dot(
        dxw_bt, w_i.astype(dxw.dtype).T, preferred_element_type=jnp.float32
    ).astype(x.dtype)

    return (
        dx,
        None,  # lengths
        dW_i.astype(w_i.dtype),
        dW_h.astype(w_h.dtype),
        db_i.astype(b_i.dtype),
        db_h.astype(b_h.dtype),
    )


_gru_trainable_zero.defvjp(_fwd, _bwd)


@jax.custom_vjp
def _gru_trainable_h0(x, lengths, w_i, w_h, b_i, b_h, h0):
    return pallas_gru_sequence(x, lengths, w_i, w_h, b_i, b_h, h0=h0)


def _fwd_h0(x, lengths, w_i, w_h, b_i, b_h, h0):
    outs, final, gates, outs_raw = pallas_gru_sequence(
        x, lengths, w_i, w_h, b_i, b_h, save_gates=True, h0=h0
    )
    res = (x, lengths, w_i, w_h, b_i, b_h, h0, gates, outs_raw)
    return (outs, final), res


def _bwd_h0(residuals, grads):
    x, lengths, w_i, w_h, b_i, b_h, h0, gates, outs_raw = residuals
    douts, dfinal = grads
    b, t, _ = x.shape
    hdim = w_h.shape[0]

    dxw, dhn, db, outs_raw, dh0 = _gru_bwd_pallas(
        gates, outs_raw, douts.astype(x.dtype), dfinal.astype(x.dtype),
        lengths, w_h, h0=h0.astype(x.dtype),
    )

    # same GEMMs as the zero-h0 path, plus the t=0 term: h_prev[0] = h0
    # (the zero-h0 path's vanishing term)
    h0c = h0.astype(dxw.dtype)
    dW_h = jnp.concatenate(
        [
            jnp.einsum("tbh,tbk->hk", outs_raw[: t - 1],
                       dxw[1:, :, : 2 * hdim],
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bh,bk->hk", h0c, dxw[0, :b, : 2 * hdim],
                         preferred_element_type=jnp.float32),
            jnp.einsum("tbh,tbk->hk", outs_raw[: t - 1], dhn[1:],
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bh,bk->hk", h0c, dhn[0, :b],
                         preferred_element_type=jnp.float32),
        ],
        axis=1,
    )
    db_h = jnp.concatenate([db[: 2 * hdim], db[3 * hdim :]])
    dxw_bt = jnp.swapaxes(dxw, 0, 1)[:b]  # [B, T, 3H] (layout bitcast)
    dW_i = jnp.einsum(
        "btd,btk->dk", x, dxw_bt, preferred_element_type=jnp.float32
    )
    db_i = db[: 3 * hdim]
    dx = jnp.dot(
        dxw_bt, w_i.astype(dxw.dtype).T, preferred_element_type=jnp.float32
    ).astype(x.dtype)

    return (
        dx,
        None,  # lengths
        dW_i.astype(w_i.dtype),
        dW_h.astype(w_h.dtype),
        db_i.astype(b_i.dtype),
        db_h.astype(b_h.dtype),
        dh0[:b].astype(h0.dtype),
    )


_gru_trainable_h0.defvjp(_fwd_h0, _bwd_h0)
