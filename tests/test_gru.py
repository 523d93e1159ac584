"""Golden tests: masked lax.scan GRU vs torch.nn.GRU with packed sequences.

This pins the parity-critical numerics (SURVEY.md "hard parts" item 1): gate
ordering, bias layout, and final-state-at-true-length must match what the
reference got from cuDNN via pack_padded_sequence.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cmhse_tpu.models.gru import (
    MaskedGRU,
    flip_padded,
    gru_sequence,
    masked_mean,
)


def _torch_gru_reference(x, lengths, tgru):
    """Run torch GRU over packed sequences; return per-step outs + final."""
    xt = torch.from_numpy(x)
    lt = torch.from_numpy(lengths)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        xt, lt, batch_first=True, enforce_sorted=False
    )
    out_packed, h_n = tgru(packed)
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out_packed, batch_first=True, total_length=x.shape[1]
    )
    return out.detach().numpy(), h_n.detach().numpy()


def _copy_torch_weights(tgru, layer=""):
    """Torch fused weights [3H, D] -> our [D, 3H] (same (r,z,n) gate order)."""
    w_i = tgru.weight_ih_l0.detach().numpy().T.copy()
    w_h = tgru.weight_hh_l0.detach().numpy().T.copy()
    b_i = tgru.bias_ih_l0.detach().numpy().copy()
    b_h = tgru.bias_hh_l0.detach().numpy().copy()
    return w_i, w_h, b_i, b_h


@pytest.mark.parametrize("seed", [0, 1])
def test_gru_matches_torch_packed(seed):
    rng = np.random.RandomState(seed)
    B, T, D, H = 5, 9, 12, 16
    x = rng.randn(B, T, D).astype(np.float32)
    lengths = np.array([9, 4, 1, 7, 6], dtype=np.int64)
    # zero the padding so any (incorrect) use of it would still be visible
    for i, l in enumerate(lengths):
        x[i, l:] = 0.0

    torch.manual_seed(seed)
    tgru = torch.nn.GRU(D, H, batch_first=True)
    t_out, t_hn = _torch_gru_reference(x, lengths, tgru)

    w_i, w_h, b_i, b_h = _copy_torch_weights(tgru)
    outs, final = gru_sequence(
        jnp.asarray(x), jnp.asarray(lengths.astype(np.int32)),
        jnp.asarray(w_i), jnp.asarray(w_h), jnp.asarray(b_i), jnp.asarray(b_h),
    )
    outs, final = np.asarray(outs), np.asarray(final)

    # final state == torch h_n (state at true length)
    np.testing.assert_allclose(final, t_hn[0], rtol=1e-5, atol=1e-5)
    # valid-step outputs match torch; padded torch outputs are zeros while
    # ours carry the state, so compare only t < length
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(
            outs[i, :l], t_out[i, :l], rtol=1e-5, atol=1e-5
        )
        # carried state after the end equals the final state
        np.testing.assert_allclose(
            outs[i, l - 1], final[i], rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("dtype,max_tol,mean_tol", [
    ("float32", 1e-5, 1e-6),
    ("bfloat16", 2e-2, 2e-3),
])
def test_gru_matches_torch_production_shape(dtype, max_tol, mean_tol):
    """Torch parity at the production hidden size (H=1024, T=64, D=500) in
    BOTH dtypes (VERDICT round 1 item 9). The bf16 band pins the dtype-cast
    boundaries in models/gru.py (bf16 activations, f32 params cast per-GEMM,
    f32 accumulation): measured drift vs the f32 torch reference is
    max ~3e-3 / mean ~6e-4 over 64 steps, so the band has ~5x headroom
    without being loose enough to hide a broken cast. B=16 rather than the
    production 64 keeps the 1-core CPU runtime sane — per-row numerics do
    not depend on batch size."""
    B, T, D, H = 16, 64, 500, 1024
    rng = np.random.RandomState(42)
    x = rng.randn(B, T, D).astype(np.float32)
    lengths = rng.randint(1, T + 1, size=B).astype(np.int64)
    lengths[0] = T  # cover the full-length row
    for i, l in enumerate(lengths):
        x[i, l:] = 0.0

    torch.manual_seed(42)
    tgru = torch.nn.GRU(D, H, batch_first=True)
    _, t_hn = _torch_gru_reference(x, lengths, tgru)

    w_i, w_h, b_i, b_h = _copy_torch_weights(tgru)
    # activations in the test dtype, params f32 — exactly what MaskedGRU
    # does in bf16 training (x.astype(dtype); weights cast inside gru_step)
    xj = jnp.asarray(x).astype(jnp.dtype(dtype))
    _, final = gru_sequence(
        xj, jnp.asarray(lengths.astype(np.int32)),
        jnp.asarray(w_i), jnp.asarray(w_h), jnp.asarray(b_i), jnp.asarray(b_h),
    )
    final = np.asarray(final.astype(jnp.float32))
    err = np.abs(final - t_hn[0])
    assert err.max() < max_tol, f"max err {err.max():.2e} over {max_tol}"
    assert err.mean() < mean_tol, f"mean err {err.mean():.2e} over {mean_tol}"


def test_gru_zero_length_rows():
    B, T, D, H = 3, 4, 6, 8
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, D).astype(np.float32)
    lengths = jnp.array([0, 4, 2], dtype=jnp.int32)
    w_i = rng.randn(D, 3 * H).astype(np.float32) * 0.1
    w_h = rng.randn(H, 3 * H).astype(np.float32) * 0.1
    b = np.zeros(3 * H, np.float32)
    _, final = gru_sequence(
        jnp.asarray(x), lengths, jnp.asarray(w_i), jnp.asarray(w_h),
        jnp.asarray(b), jnp.asarray(b),
    )
    np.testing.assert_array_equal(np.asarray(final[0]), np.zeros(H, np.float32))


def test_padding_does_not_perturb_final_state():
    """Garbage in the padded tail must not change the final state."""
    rng = np.random.RandomState(3)
    B, T, D, H = 4, 10, 8, 8
    x = rng.randn(B, T, D).astype(np.float32)
    lengths = jnp.array([3, 10, 7, 1], dtype=jnp.int32)
    w = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
    w_i, w_h, b_i, b_h = w(D, 3 * H), w(H, 3 * H), w(3 * H), w(3 * H)

    _, final_clean = gru_sequence(jnp.asarray(x), lengths, w_i, w_h, b_i, b_h)
    x_dirty = x.copy()
    for i, l in enumerate(np.asarray(lengths)):
        x_dirty[i, l:] = 1e6
    _, final_dirty = gru_sequence(jnp.asarray(x_dirty), lengths, w_i, w_h, b_i, b_h)
    np.testing.assert_array_equal(np.asarray(final_clean), np.asarray(final_dirty))


def test_bidirectional_matches_torch():
    rng = np.random.RandomState(7)
    B, T, D, H = 4, 6, 5, 7
    x = rng.randn(B, T, D).astype(np.float32)
    lengths = np.array([6, 3, 5, 1], dtype=np.int64)
    for i, l in enumerate(lengths):
        x[i, l:] = 0.0

    torch.manual_seed(7)
    tgru = torch.nn.GRU(D, H, batch_first=True, bidirectional=True)
    t_out, t_hn = _torch_gru_reference(x, lengths, tgru)

    model = MaskedGRU(features=H, bidirectional=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lengths.astype(np.int32))
    )
    # overwrite params with torch's
    p = dict(variables["params"])
    p["fwd_w_i"] = jnp.asarray(tgru.weight_ih_l0.detach().numpy().T.copy())
    p["fwd_w_h"] = jnp.asarray(tgru.weight_hh_l0.detach().numpy().T.copy())
    p["fwd_b_i"] = jnp.asarray(tgru.bias_ih_l0.detach().numpy().copy())
    p["fwd_b_h"] = jnp.asarray(tgru.bias_hh_l0.detach().numpy().copy())
    p["bwd_w_i"] = jnp.asarray(tgru.weight_ih_l0_reverse.detach().numpy().T.copy())
    p["bwd_w_h"] = jnp.asarray(tgru.weight_hh_l0_reverse.detach().numpy().T.copy())
    p["bwd_b_i"] = jnp.asarray(tgru.bias_ih_l0_reverse.detach().numpy().copy())
    p["bwd_b_h"] = jnp.asarray(tgru.bias_hh_l0_reverse.detach().numpy().copy())

    outs, final = model.apply(
        {"params": p}, jnp.asarray(x), jnp.asarray(lengths.astype(np.int32))
    )
    outs, final = np.asarray(outs), np.asarray(final)
    t_final = np.concatenate([t_hn[0], t_hn[1]], axis=-1)
    np.testing.assert_allclose(final, t_final, rtol=1e-5, atol=1e-5)
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(outs[i, :l], t_out[i, :l], rtol=1e-5, atol=1e-5)


def test_flip_padded():
    x = jnp.asarray(
        np.array([[[1], [2], [3], [9]], [[4], [5], [9], [9]]], np.float32)
    )
    lengths = jnp.array([3, 2], dtype=jnp.int32)
    flipped = np.asarray(flip_padded(x, lengths))
    np.testing.assert_array_equal(
        flipped[:, :, 0], np.array([[3, 2, 1, 9], [5, 4, 9, 9]], np.float32)
    )


def test_masked_mean():
    outs = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 4, 3))
    lengths = jnp.array([2, 4], dtype=jnp.int32)
    got = np.asarray(masked_mean(outs, lengths))
    want0 = np.arange(24).reshape(2, 4, 3)[0, :2].mean(axis=0)
    want1 = np.arange(24).reshape(2, 4, 3)[1, :4].mean(axis=0)
    np.testing.assert_allclose(got[0], want0, rtol=1e-6)
    np.testing.assert_allclose(got[1], want1, rtol=1e-6)
