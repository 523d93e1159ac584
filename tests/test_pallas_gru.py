"""Pallas fused GRU forward parity vs the lax.scan reference (interpret mode
on CPU; SURVEY.md section 4.2)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cmhse_tpu.models.gru import gru_sequence
from cmhse_tpu.ops.pallas_gru import pallas_gru_sequence


def _setup(B, T, D, H, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lengths = jnp.asarray(rng.randint(0, T + 1, B).astype(np.int32))
    w_i = jnp.asarray((rng.randn(D, 3 * H) * 0.1).astype(np.float32))
    w_h = jnp.asarray((rng.randn(H, 3 * H) * 0.1).astype(np.float32))
    b_i = jnp.asarray((rng.randn(3 * H) * 0.1).astype(np.float32))
    b_h = jnp.asarray((rng.randn(3 * H) * 0.1).astype(np.float32))
    return x, lengths, w_i, w_h, b_i, b_h


@pytest.mark.parametrize("B,T,D,H", [
    (8, 6, 12, 16),     # tiny
    (300, 5, 8, 8),     # batch not a multiple of the chunk
])
def test_pallas_gru_matches_scan(B, T, D, H):
    args = _setup(B, T, D, H)
    outs_ref, final_ref = gru_sequence(*args)
    outs_pal, final_pal = pallas_gru_sequence(*args)
    np.testing.assert_allclose(
        np.asarray(final_pal), np.asarray(final_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(outs_pal), np.asarray(outs_ref), rtol=1e-5, atol=1e-5
    )


def test_pallas_gru_zero_length_rows():
    x, lengths, w_i, w_h, b_i, b_h = _setup(8, 4, 6, 8, seed=1)
    lengths = lengths.at[0].set(0)
    _, final = pallas_gru_sequence(x, lengths, w_i, w_h, b_i, b_h)
    np.testing.assert_array_equal(np.asarray(final)[0], np.zeros(8))
