"""Embedding-space primitives (rebuilds ``l2norm``/``cosine_sim`` from the
reference's ``model.py``; SURVEY.md C7).

Everything here is shape-static and fuses cleanly under ``jit``: the batch
cosine-similarity matrix is a single MXU GEMM over L2-normalized rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

EPS = 1e-8


def l2norm(x: Array, axis: int = -1, eps: float = EPS) -> Array:
    """Row-normalize to unit L2 norm.

    The reference divides by ``norm + eps`` in float32; we compute
    ``x * rsqrt(sq + eps^2)`` instead — same value to ~1e-8 relative for any
    nonzero row, but with a gradient that is finite even for EXACTLY zero
    rows (which occur for padded clip/sentence slots at init). The naive
    ``where(sq > 0, 1/sqrt(sq), 0)`` form NaNs in the backward pass there:
    the untaken branch's infinite derivative meets the zero selector
    (0 * inf). The reduction stays float32 even for bfloat16 activations so
    cosine similarities stay rank-stable.
    """
    sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True)
    inv = jax.lax.rsqrt(sq + eps * eps)
    return (x.astype(jnp.float32) * inv).astype(x.dtype)


def cosine_sim(a: Array, b: Array) -> Array:
    """All-pairs cosine similarity ``[Na, Nb]`` of row-vectors.

    Inputs are expected to be L2-normalized already (matching the reference,
    which normalizes inside the encoders and then takes a plain ``mm``); the
    matmul runs on the MXU in float32 accumulation.
    """
    return jnp.dot(a, b.T, preferred_element_type=jnp.float32)
