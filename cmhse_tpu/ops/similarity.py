"""Embedding-space primitives (rebuilds ``l2norm``/``cosine_sim`` from the
reference's ``model.py``; SURVEY.md C7).

Everything here is shape-static and fuses cleanly under ``jit``: the batch
cosine-similarity matrix is a single MXU GEMM over L2-normalized rows.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

EPS = 1e-8


def l2norm(x: Array, axis: int = -1, eps: float = EPS) -> Array:
    """Row-normalize to unit L2 norm.

    The reference divides by ``norm + eps`` computed in float32; we keep the
    reduction in float32 even if ``x`` is bfloat16 so downstream cosine
    similarities stay rank-stable.
    """
    sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True)
    inv = jnp.where(sq > 0, 1.0 / (jnp.sqrt(sq) + eps), 0.0)
    return (x.astype(jnp.float32) * inv).astype(x.dtype)


def cosine_sim(a: Array, b: Array) -> Array:
    """All-pairs cosine similarity ``[Na, Nb]`` of row-vectors.

    Inputs are expected to be L2-normalized already (matching the reference,
    which normalizes inside the encoders and then takes a plain ``mm``); the
    matmul runs on the MXU in float32 accumulation.
    """
    return jnp.dot(a, b.T, preferred_element_type=jnp.float32)
