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


def test_pallas_gru_matches_scan_bf16():
    """bf16 parity (VERDICT round 1 item 9): the kernel's cast boundaries
    (bf16 W_h in VMEM, f32 scratch carry, f32 MXU accumulate) must track the
    scan path's own bf16 numerics step-for-step. Both paths see identical
    bf16 inputs, so residual drift is only gate-math reassociation — band
    1e-2 has ~10x headroom over the measured max (~1e-3)."""
    x, lengths, w_i, w_h, b_i, b_h = _setup(16, 12, 64, 128, seed=2)
    args = (x.astype(jnp.bfloat16), lengths, w_i, w_h, b_i, b_h)
    outs_ref, final_ref = gru_sequence(*args)
    outs_pal, final_pal = pallas_gru_sequence(*args)
    f32 = lambda a: np.asarray(a.astype(jnp.float32))
    np.testing.assert_allclose(f32(final_pal), f32(final_ref), atol=1e-2)
    np.testing.assert_allclose(f32(outs_pal), f32(outs_ref), atol=1e-2)


def test_pallas_gru_zero_length_rows():
    x, lengths, w_i, w_h, b_i, b_h = _setup(8, 4, 6, 8, seed=1)
    lengths = lengths.at[0].set(0)
    _, final = pallas_gru_sequence(x, lengths, w_i, w_h, b_i, b_h)
    np.testing.assert_array_equal(np.asarray(final)[0], np.zeros(8))
