"""Pallas GRU forward kernel — the TPU-native answer to cuDNN's fused GRU
(SURVEY.md section 2a).

The XLA ``lax.scan`` GRU is correct but per-step it re-reads the recurrent
weights and bounces every gate intermediate through HBM. This kernel runs
the whole time loop inside ONE Pallas program:

  * the recurrent weights ``W_h`` (bf16) are loaded into VMEM once and
    pinned there for all T steps;
  * the hidden state lives in a VMEM scratch buffer across grid steps — it
    never touches HBM until the final write;
  * per step, the only HBM traffic is streaming in ``x_t @ W_i`` (computed
    beforehand as one large MXU GEMM) and streaming out ``h_t``;
  * the batch is chunked over an outer grid dimension so each chunk's
    working set fits VMEM (w_h bf16 6 MB + xw/outs pipeline buffers).

Grid: ``(num_batch_chunks, T)`` — T innermost, so each chunk's time loop is
consecutive and the scratch carry is valid.

This module is the FORWARD time loop only (no VJP) — the encode path (eval,
serving, benchmarks) calls it behind the same ``gru_sequence`` signature.
Training routes through ``ops/pallas_gru_grad.py``, which wraps this
forward in a custom VJP with a fused BPTT backward — that wrapper is what
``MaskedGRU(use_pallas=True)`` dispatches to, and it IS valid for training.
Parity vs the scan implementation is pinned in tests/test_pallas_gru.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 256  # batch-chunk rows per grid step
# timesteps per grid invocation. The VMEM budget caps tb*steps at ~256 for
# H=1024 (2-step blocks OOM the 16 MB scoped limit even in bf16, measured on
# v5e), and total grid steps scale as 1/(tb*steps) — so multi-step blocks
# only help if tb shrinks proportionally, which is a wash. Kept at 1; the
# machinery supports >1 for smaller models.
_STEPS = 1


def _use_interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu",)


def _gru_kernel(*refs, steps: int, save_gates: bool, with_h0: bool):
    """Forward time loop; with ``save_gates`` it ALSO streams out the gate
    activations ``[r, z, n, hn]`` (4H per step) for a following fused BPTT
    backward.

    Saving the gates turns the backward's per-step recompute GEMM
    (``h_prev @ W_h``, the same cost as the forward loop) into a pure
    bandwidth stream that hides under the backward's remaining GEMM — the
    backward kernel then needs neither ``x @ W_i`` nor ``b_h`` at all. The
    extra forward write is DMA that hides under the forward's MXU time.

    ``with_h0``: an extra ``[TB, H]`` input block seeds the carry (the
    reconstruction decoder's projected high-level embedding); without it the
    carry starts at zero and the kernel signature is unchanged.
    """
    if with_h0:
        len_ref, wh_ref, bh_ref, xw_ref, h0_ref = refs[:5]
        rest = refs[5:]
    else:
        len_ref, wh_ref, bh_ref, xw_ref = refs[:4]
        h0_ref = None
        rest = refs[4:]
    outs_ref, final_ref = rest[0], rest[1]
    if save_gates:
        gates_ref, h_scratch = rest[2], rest[3]
    else:
        h_scratch = rest[2]
    tb = pl.program_id(1)  # time-block index
    n_tb = pl.num_programs(1)

    @pl.when(tb == 0)
    def _():
        if h0_ref is None:
            h_scratch[:] = jnp.zeros_like(h_scratch)
        else:
            h_scratch[:] = h0_ref[:].astype(jnp.float32)

    hdtype = wh_ref.dtype
    hidden = h_scratch.shape[-1]
    h = h_scratch[:]  # (TB, H) f32
    for s in range(steps):  # static unroll: `steps` sequential GRU steps
        t = tb * steps + s
        hw = jnp.dot(
            h.astype(hdtype), wh_ref[:], preferred_element_type=jnp.float32
        ) + bh_ref[0, :][None, :]
        xw = xw_ref[s].astype(jnp.float32)  # (TB, 3H)
        xr = xw[:, :hidden]
        xz = xw[:, hidden : 2 * hidden]
        xn = xw[:, 2 * hidden :]
        hr = hw[:, :hidden]
        hz = hw[:, hidden : 2 * hidden]
        hn = hw[:, 2 * hidden :]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h

        # lengths arrive as a (TB, 1) block: the comparison is natively 2D
        # (Mosaic can't reshape 1-bit vectors to add a minor dim)
        keep = t < len_ref[:]  # (TB, 1) bool
        h = jnp.where(keep, h_new, h)
        outs_ref[s] = h.astype(outs_ref.dtype)
        if save_gates:
            gates_ref[s] = jnp.concatenate([r, z, n, hn], axis=-1).astype(
                gates_ref.dtype
            )

    h_scratch[:] = h

    @pl.when(tb == n_tb - 1)
    def _():
        final_ref[:] = h.astype(final_ref.dtype)


def pallas_gru_sequence(
    x: Array,
    lengths: Array,
    w_i: Array,
    w_h: Array,
    b_i: Array,
    b_h: Array,
    save_gates: bool = False,
    h0: Array | None = None,
) -> tuple[Array, Array] | tuple[Array, Array, Array, Array]:
    """Forward-only masked GRU with the time loop fused in one kernel.

    Same contract as :func:`cmhse_tpu.models.gru.gru_sequence` (``h0``
    optional initial state, zeros by default): returns (outputs
    ``[B, T, H]``, final ``[B, H]``).

    With ``save_gates=True`` (the training path, see
    ``ops/pallas_gru_grad.py``) additionally returns the per-step gate
    activations ``[r, z, n, hn]`` as a RAW PADDED time-major array
    ``[T, B_padded, 4H]`` in the compute dtype, plus the RAW PADDED
    time-major outputs ``[T, B_padded, H]`` (the backward's h_prev source)
    — exactly the layouts the backward kernel streams, so no transpose,
    shift, or slice sits between the two kernels. Only the backward
    wrapper should consume these values.
    """
    b, t, _ = x.shape
    hdim = w_h.shape[0]
    dtype = x.dtype

    # one big MXU GEMM for all input projections (same as the scan path)
    xw = (
        jnp.dot(x, w_i.astype(dtype), preferred_element_type=jnp.float32)
        + b_i
    ).astype(dtype)  # [B, T, 3H]
    xw = jnp.swapaxes(xw, 0, 1)  # [T, B, 3H]

    # f32 streams double the VMEM of bf16 and W_h alone is 12.6 MB at H=1024;
    # halve the batch chunk so the pipeline buffers fit the scoped limit
    # (observed OOM at tb=256/f32 inside larger training graphs).
    # tb must be a multiple of 8 (Mosaic sublane tiling) — round small
    # batches UP; the batch-padding below absorbs the excess rows.
    # The gate-saving variant streams an extra 4H output per step: halve the
    # chunk again so its pipeline buffers stay inside the scoped limit.
    tb_cap = _TB if dtype == jnp.bfloat16 else _TB // 2
    if save_gates:
        tb_cap //= 2
    tb = min(tb_cap, max(8, -(-b // 8) * 8))
    steps = min(_STEPS, t)

    # pad T to a steps-per-block multiple (padded steps are masked by length)
    t_pad = (-t) % steps
    if t_pad:
        xw = jnp.pad(xw, ((0, t_pad), (0, 0), (0, 0)))
    tp = t + t_pad
    n_tblocks = tp // steps

    # pad the batch to a chunk multiple; padded rows have length 0
    pad = (-b) % tb
    if pad:
        xw = jnp.pad(xw, ((0, 0), (0, pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
        if h0 is not None:
            h0 = jnp.pad(h0, ((0, pad), (0, 0)))
    bp = b + pad
    n_chunks = bp // tb

    wh = w_h.astype(jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32)
    bh2 = b_h.astype(jnp.float32)[None, :]
    len2 = lengths.astype(jnp.int32)[:, None]  # [Bp, 1]

    in_specs = [
        pl.BlockSpec((tb, 1), lambda c, tt: (c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hdim, 3 * hdim), lambda c, tt: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * hdim), lambda c, tt: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((steps, tb, 3 * hdim), lambda c, tt: (tt, c, 0),
                     memory_space=pltpu.VMEM),
    ]
    if h0 is not None:
        in_specs.append(
            pl.BlockSpec((tb, hdim), lambda c, tt: (c, 0),
                         memory_space=pltpu.VMEM)
        )
    out_specs = [
        pl.BlockSpec((steps, tb, hdim), lambda c, tt: (tt, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, hdim), lambda c, tt: (c, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((tp, bp, hdim), dtype),
        jax.ShapeDtypeStruct((bp, hdim), dtype),
    ]
    if save_gates:
        out_specs.append(
            pl.BlockSpec((steps, tb, 4 * hdim), lambda c, tt: (tt, c, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((tp, bp, 4 * hdim), dtype))

    operands = [len2, wh, bh2, xw]
    if h0 is not None:
        operands.append(h0.astype(dtype))
    results = pl.pallas_call(
        functools.partial(_gru_kernel, steps=steps, save_gates=save_gates,
                          with_h0=h0 is not None),
        grid=(n_chunks, n_tblocks),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((tb, hdim), jnp.float32)],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * tp * hdim * 3 * hdim,
            bytes_accessed=bp * tp * 4 * hdim * 2,
            transcendentals=bp * tp * 3 * hdim,
        ),
    )(*operands)

    outs, final = results[0], results[1]
    outs_bt = jnp.swapaxes(outs, 0, 1)[:b, :t]
    if save_gates:
        return outs_bt, final[:b], results[2], outs
    return outs_bt, final[:b]
