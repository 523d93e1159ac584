"""Pallas TPU kernels for the two similarity hot paths (SURVEY.md section 2a:
the first-party replacements for the reference's cuBLAS sim-GEMM + host
ranking):

  1. :func:`fused_contrastive_loss` — cosine-similarity tiles fused with the
     max-of-hinges reduction for BOTH retrieval directions in ONE pass over
     the similarity matrix. The B x B matrix never touches HBM: each
     (TM, TN) tile is produced on the MXU, turned into hinge logits on the
     VPU, and folded into running row/column maxima in VMEM. A custom VJP
     uses the saved argmax indices, so the backward pass is O(B*D) gathers
     instead of a second GEMM.

  2. :func:`pallas_rank_counts` — the eval/serving path: for each query,
     count gallery items scoring above the positive (the argsort-free rank,
     see ``cmhse_tpu.ops.ranking``) while streaming gallery tiles through
     VMEM. Enables galleries far beyond what a materialized [Q, N] matrix
     would allow.

Both kernels run in interpret mode off-TPU, and are parity-tested against the
jnp reference implementations over tile-edge shapes (SURVEY.md section 4.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 128  # query-row tile
_TN = 128  # gallery-column tile
_NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu",)


def _pad_rows_2d(x: Array, multiple: int) -> Array:
    rem = (-x.shape[0]) % multiple
    if rem:
        x = jnp.pad(x, ((0, rem), (0, 0)))
    return x


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# 1. fused cosine-sim + max-of-hinges contrastive loss
# ---------------------------------------------------------------------------


def _simhinge_row_kernel(
    a_ref, b_ref, negmask_ref, diag_ref, rowmax_ref, rowarg_ref,
    *, margin: float,
):
    """One retrieval direction: for each query row i of A, the hardest
    negative ``max_j margin + (A B^T)[i, j] - diag[i]`` and its argmax.
    Row tiles are the outer grid dim; column tiles accumulate inner
    (consecutive revisits of the same output block — the legal pattern)."""
    j = pl.program_id(1)
    tn = negmask_ref.shape[1]

    # contracting dims (1, 1): A[i,:].B[j,:] without an explicit .T, which
    # would materialize a transposed copy of every b-tile before the MXU
    s = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TM, TN)
    neg = negmask_ref[:] > 0.5  # f32 mask: Mosaic can't compare i8 vectors
    row_logit = jnp.where(neg, margin + s - diag_ref[0, :][:, None], _NEG_INF)
    tile_rmax = jnp.max(row_logit, axis=1)  # (TM,)
    tile_rarg = jnp.argmax(row_logit, axis=1).astype(jnp.int32) + j * tn

    @pl.when(j == 0)
    def _():
        rowmax_ref[0, :] = tile_rmax
        rowarg_ref[0, :] = tile_rarg

    @pl.when(j > 0)
    def _():
        cur = rowmax_ref[0, :]
        upd = tile_rmax > cur
        rowmax_ref[0, :] = jnp.where(upd, tile_rmax, cur)
        rowarg_ref[0, :] = jnp.where(upd, tile_rarg, rowarg_ref[0, :])


def _simhinge_rowpass(a_p, b_p, nm, diag, margin):
    """Run the row kernel over padded inputs: (row_max [Bp], row_arg [Bp])."""
    bp, d = a_p.shape
    n_i, n_j = bp // _TM, bp // _TN
    kernel = functools.partial(_simhinge_row_kernel, margin=float(margin))
    rowmax, rowarg = pl.pallas_call(
        kernel,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((_TM, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, _TN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TM), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _TM), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TM), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, bp), jnp.float32),
            jax.ShapeDtypeStruct((1, bp), jnp.int32),
        ),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * bp * d, bytes_accessed=2 * bp * d * 4,
            transcendentals=0,
        ),
    )(a_p, b_p, nm, diag)
    return rowmax[0], rowarg[0]


def _simhinge_forward(a, b, neg_mask, margin):
    """Returns (row_max, row_arg, col_max, col_arg) over the true batch.

    Two passes of the same row kernel: the b->a direction is the a->b
    direction of the transposed problem (cost_ba[i, j] uses diag[j], and
    ``(B A^T)[j, i] = (A B^T)[i, j]``), so a second pass with (b, a,
    neg_mask^T) yields the column maxima/argmaxes directly.
    """
    bsz, _ = a.shape
    a_p = _pad_rows_2d(a.astype(jnp.float32), _TM)
    b_p = _pad_rows_2d(b.astype(jnp.float32), _TN)
    bp = a_p.shape[0]
    nm = jnp.zeros((bp, bp), jnp.float32)
    nm = nm.at[:bsz, :bsz].set(neg_mask.astype(jnp.float32))
    diag = jnp.sum(a_p * b_p, axis=1)[None, :]  # [1, Bp]

    row_max, row_arg = _simhinge_rowpass(a_p, b_p, nm, diag, margin)
    col_max, col_arg = _simhinge_rowpass(b_p, a_p, nm.T, diag, margin)
    return (
        row_max[:bsz], row_arg[:bsz],
        col_max[:bsz], col_arg[:bsz],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_contrastive_loss(
    emb_a: Array,
    emb_b: Array,
    neg_mask: Array,
    valid: Array,
    margin: float = 0.2,
) -> Array:
    """Pallas-fused bidirectional max-of-hinges contrastive loss.

    Semantics identical to
    ``cmhse_tpu.ops.loss.contrastive_loss(..., max_violation=True)`` with
    ``neg_mask = (~positive_mask) & valid_i & valid_j`` precomputed. Mean
    over valid queries; both directions summed.
    """
    loss, _ = _loss_fwd(emb_a, emb_b, neg_mask, valid, margin)
    return loss


def _loss_fwd(emb_a, emb_b, neg_mask, valid, margin):
    row_max, row_arg, col_max, col_arg = _simhinge_forward(
        emb_a, emb_b, neg_mask, margin
    )
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    loss_ab = jnp.where(valid, jnp.maximum(row_max, 0.0), 0.0)
    loss_ba = jnp.where(valid, jnp.maximum(col_max, 0.0), 0.0)
    loss = (jnp.sum(loss_ab) + jnp.sum(loss_ba)) / n_valid
    residuals = (emb_a, emb_b, row_max, row_arg, col_max, col_arg, valid,
                 n_valid)
    return loss, residuals


def _loss_bwd(margin, residuals, g):
    emb_a, emb_b, row_max, row_arg, col_max, col_arg, valid, n_valid = (
        residuals
    )
    a32 = emb_a.astype(jnp.float32)
    b32 = emb_b.astype(jnp.float32)
    w = (g / n_valid).astype(jnp.float32)
    act_r = (valid & (row_max > 0)).astype(jnp.float32)[:, None] * w
    act_c = (valid & (col_max > 0)).astype(jnp.float32)[:, None] * w

    # dS entries (see ops.loss): row term +1 at (i, row_arg[i]), -1 at (i,i);
    # col term +1 at (col_arg[j], j), -1 at (j,j). dA = dS @ B, dB = dS^T @ A.
    dA = act_r * (jnp.take(b32, row_arg, axis=0) - b32)
    dA = dA - act_c * b32
    dA = dA.at[col_arg].add(act_c * b32)

    dB = act_c * (jnp.take(a32, col_arg, axis=0) - a32)
    dB = dB - act_r * a32
    dB = dB.at[row_arg].add(act_r * a32)

    return (
        dA.astype(emb_a.dtype),
        dB.astype(emb_b.dtype),
        None,  # neg_mask
        None,  # valid
    )


fused_contrastive_loss.defvjp(_loss_fwd, _loss_bwd)


def pallas_contrastive_loss(
    emb_a: Array,
    emb_b: Array,
    margin: float = 0.2,
    positive_mask: Array | None = None,
    valid: Array | None = None,
) -> Array:
    """Drop-in for ``ops.loss.contrastive_loss`` (max_violation=True) built on
    the fused kernel. Builds the negatives mask and dispatches."""
    bsz = emb_a.shape[0]
    if positive_mask is None:
        positive_mask = jnp.eye(bsz, dtype=bool)
    if valid is None:
        valid = jnp.ones((bsz,), bool)
    pair_valid = valid[:, None] & valid[None, :]
    neg_mask = (~positive_mask) & pair_valid
    return fused_contrastive_loss(emb_a, emb_b, neg_mask, valid, float(margin))


# ---------------------------------------------------------------------------
# 2. streaming rank-count kernel (eval / serving)
# ---------------------------------------------------------------------------

# Galleries at or above this size take the streaming kernel automatically on
# TPU. The crossover is measured, not aspirational (PERFORMANCE.md, v5e,
# D=1024): BELOW it the dense path is faster — XLA's default f32 jnp.dot
# uses bf16 multiplies at 2x the MXU's f32 rate and the [Q, N] block still
# fits comfortably. ABOVE it the full-gallery [N, N] materialization climbs
# into multiple GB (4.3 GB at N=32k, impossible at N=100k+) while the
# streaming kernel stays O(Q) memory and beats the precision-matched dense
# path 3x (434k vs 140k QPS at N=100k).
STREAMING_GALLERY_MIN = 32_768


def should_stream(n_gallery: int, force: bool | None = None) -> bool:
    """Dispatch policy for rank counting: explicit ``force`` wins; otherwise
    stream on real TPU for galleries >= STREAMING_GALLERY_MIN (interpret mode
    off-TPU would be slower than the dense jnp path)."""
    if force is not None:
        return force
    return (
        jax.devices()[0].platform == "tpu"
        and n_gallery >= STREAMING_GALLERY_MIN
    )


def _rc_tiles(q: int, d: int) -> tuple[int, int]:
    """Rank-count tile sizes. Big tiles matter here (unlike the B x B loss
    kernel): with TM query rows per tile the WHOLE gallery streams from HBM
    ceil(Q/TM) times, and grid-invocation overhead scales inversely with
    TM*TN. Measured at Q=1024 vs a 100k x 1024 f32 gallery on v5e:
    128x128 tiles -> 144k QPS; 1024x512 -> 359k QPS (2.5x, and ~92% of the
    f32 MXU roofline — see PERFORMANCE.md for the dense-path comparison).
    Budget: q tile TM*D f32 + double-buffered g tiles 2*TN*D f32 within
    ~12 MB of the 16 MB VMEM. The VMEM-budget terms are floored to a
    multiple of 128 — Mosaic rejects tiles whose lane/sublane extents are
    not 128/8-aligned (budget quotients like 6 MiB/d hit odd values for
    d > 1536, and the count/gvalid blocks carry TM/TN on the LANE dim)."""
    budget_m = max(128, (6 * 2**20 // (d * 4)) // 128 * 128)
    budget_n = max(128, (3 * 2**20 // (d * 4)) // 128 * 128)
    tm = min(_cdiv(q, 128) * 128, 1024, budget_m)
    # tn=1024 was tried in round 3 on the overhead hypothesis and measured
    # THE SAME (430k vs 434k QPS at Q=1024/N=100k/D=1024): the kernel sits
    # at ~89-92% of the f32 MXU roofline, so bigger tiles buy nothing —
    # keep the sweep-best (1024, 512).
    tn = min(512, budget_n)
    return tm, tn


def _rankcount_kernel(q_ref, g_ref, pos_ref, posidx_ref, gvalid_ref,
                      count_ref, *, lowp: bool):
    j = pl.program_id(1)
    tn = g_ref.shape[0]
    # TRANSPOSED tile layout, deliberately: s = G @ Q^T gives (TN, TM) with
    # queries on the LANE dim, so (a) the per-query count reduction runs
    # over SUBLANES (strided vector adds — much faster than a lane-dim
    # reduction), and (b) the accumulated (1, TM) count row is lane-shaped.
    # dot_general with contracting dims (1, 1), never an explicit .T (that
    # would materialize a transposed copy of every tile before the MXU).
    _dn = (((1,), (1,)), ((), ()))
    if lowp:
        # bf16 multiplies + f32 accumulate: matches XLA's DEFAULT matmul
        # precision for f32 inputs on TPU (what the dense jnp.dot path
        # actually computes), at 2x the f32 MXU rate
        s = jax.lax.dot_general(
            g_ref[:].astype(jnp.bfloat16), q_ref[:].astype(jnp.bfloat16),
            _dn, preferred_element_type=jnp.float32,
        )
    else:
        s = jax.lax.dot_general(
            g_ref[:], q_ref[:], _dn, preferred_element_type=jnp.float32,
        )  # (TN, TM)
    # minor-dim insert BEFORE the bool compare: Mosaic can't reshape 1-bit
    # vectors into a new minor dim (f32 inserts are fine)
    gt = (s > pos_ref[0, :][None, :]) & (gvalid_ref[0, :][:, None] > 0.5)
    # Exclude each query's own positive column BY INDEX: its in-tile GEMM
    # score can differ from the separately-reduced pos_score by 1 ulp, which
    # would make the positive count as its own violator (off-by-one rank).
    row_ids = j * tn + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    gt = gt & (row_ids != posidx_ref[0, :][None, :])
    tile_counts = jnp.sum(gt.astype(jnp.int32), axis=0)

    @pl.when(j == 0)
    def _():
        count_ref[0, :] = tile_counts

    @pl.when(j > 0)
    def _():
        count_ref[0, :] = count_ref[0, :] + tile_counts


def pallas_violation_counts(
    queries: Array,
    gallery: Array,
    pos_score: Array,
    gallery_valid: Array | None = None,
    pos_idx: Array | None = None,
    precision: str = "float32",
) -> Array:
    """Raw strictly-greater counts ``[Q]`` int32: how many (valid) gallery
    rows score above each query's positive, streaming gallery tiles through
    VMEM without materializing ``[Q, N]``.

    This is the building block shared by the single-device streaming metrics
    and the sharded gallery mode (where per-shard counts are ``psum``-ed).

    Args:
      queries: ``[Q, D]`` query embeddings.
      gallery: ``[N, D]`` gallery embeddings.
      pos_score: ``[Q]`` each query's similarity to its positive.
      gallery_valid: optional bool ``[N]``; False rows never count (device-
        resident galleries keep padded rows in place).
      pos_idx: optional int32 ``[Q]`` gallery index of each query's positive
        (out-of-range for "not in this gallery"); that column is excluded by
        index so a 1-ulp difference between the kernel's GEMM score and the
        separately-reduced ``pos_score`` can never count the positive as its
        own violator. None = no exclusion (positive not in this gallery, or
        pos_score came from the same GEMM).

      precision: "float32" (exact, the default — rank parity with an f32
        similarity matrix is guaranteed for distinct scores) or "bfloat16"
        (bf16 multiplies + f32 accumulate, 2x the MXU rate; same multiply
        precision as XLA's DEFAULT for f32 jnp.dot on TPU, so near-tie
        ranks can differ from the f32-exact answer the way the default
        dense path's already do). Tie caveat (either precision): a gallery
        row whose score EXACTLY ties the positive (e.g. a duplicate of the
        positive row) compares against the caller's separately-reduced
        ``pos_score``, whose reduction order differs from the kernel GEMM's
        by up to 1 ulp — such a duplicate may rank one earlier/later than
        the dense path reports. ``pos_idx`` protects the positive's own
        column; exact-duplicate rows are a data property, not a kernel one.

    Inside ``shard_map`` callers must pass ``check_vma=False`` — the
    varying-mesh-axes checker cannot see through interpret-mode pallas
    block slicing (see parallel/eval_sharded.py).
    """
    q, d = queries.shape
    n = gallery.shape[0]
    tm, tn = _rc_tiles(q, d)
    q_p = _pad_rows_2d(queries.astype(jnp.float32), tm)
    g_p = _pad_rows_2d(gallery.astype(jnp.float32), tn)
    qp, np_ = q_p.shape[0], g_p.shape[0]
    pos_p = jnp.full((1, qp), jnp.inf, jnp.float32)
    pos_p = pos_p.at[0, :q].set(pos_score.astype(jnp.float32))
    posidx_p = jnp.full((1, qp), -1, jnp.int32)
    if pos_idx is not None:
        posidx_p = posidx_p.at[0, :q].set(pos_idx.astype(jnp.int32))
    gvalid_vec = jnp.arange(np_) < n
    if gallery_valid is not None:
        gvalid_vec = gvalid_vec & jnp.pad(
            gallery_valid.astype(bool), (0, np_ - n)
        )
    gvalid = gvalid_vec.astype(jnp.float32)[None, :]

    counts = pl.pallas_call(
        functools.partial(_rankcount_kernel,
                          lowp=(precision == "bfloat16")),
        grid=(qp // tm, np_ // tn),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, qp), jnp.int32),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * np_ * d,
            bytes_accessed=(qp + np_) * d * 4,
            transcendentals=0,
        ),
    )(q_p, g_p, pos_p, posidx_p, gvalid)
    return counts[0, :q]


def pallas_rank_counts(
    queries: Array,
    gallery: Array,
    pos_score: Array,
    gallery_valid: Array | None = None,
    pos_idx: Array | None = None,
    precision: str = "float32",
) -> Array:
    """1-based rank of each query's positive via the streaming count kernel
    (see :func:`pallas_violation_counts`); NaN positives rank worst."""
    ranks = pallas_violation_counts(
        queries, gallery, pos_score, gallery_valid, pos_idx=pos_idx,
        precision=precision,
    ) + 1
    # NaN positive => worst rank (see ops.ranking.retrieval_ranks). The
    # sentinel is the VALID gallery size when a mask is given — the dense
    # path compacts invalid rows away before ranking, and the dispatch
    # boundary (should_stream) must not change NaN-query metrics.
    n = gallery.shape[0]
    worst = (
        n if gallery_valid is None
        else jnp.sum(gallery_valid.astype(jnp.int32))
    )
    return jnp.where(jnp.isnan(pos_score), worst, ranks)
