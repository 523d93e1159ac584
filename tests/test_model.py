"""Model-level unit tests: encoder shapes/masking, attention pooling,
flat vs hierarchical paths, reconstruction decoder (SURVEY.md C4-C6, C8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmhse_tpu.config import DataConfig, ModelConfig
from cmhse_tpu.data import SyntheticHierarchicalDataset, batches_from_dataset
from cmhse_tpu.models import CMHSE, AttentionPool, SequenceEncoder
from cmhse_tpu.models.cmhse import ReconstructionDecoder


def _batch(cfg_data, n=6, seed=0):
    ds = SyntheticHierarchicalDataset(
        num_videos=n, feat_dim=cfg_data.feat_dim,
        vocab_size=cfg_data.vocab_size, max_clips=cfg_data.max_clips,
        max_frames=cfg_data.max_frames, max_words=cfg_data.max_words,
        seed=seed,
    )
    return next(iter(batches_from_dataset(ds, cfg_data, shuffle=False)))


def test_hierarchical_output_shapes_and_norms():
    dcfg = DataConfig(batch_size=6, feat_dim=12, vocab_size=50, max_clips=3,
                      max_frames=5, max_sentences=3, max_words=4)
    mcfg = ModelConfig(embed_size=16, word_dim=8, feat_dim=12, rnn_hidden=16,
                       hierarchical=True)
    b = _batch(dcfg)
    model = CMHSE(cfg=mcfg, vocab_size=50)
    params = model.init(jax.random.PRNGKey(0), b)["params"]
    out = model.apply({"params": params}, b)
    assert out.video_emb.shape == (6, 16)
    assert out.clip_emb.shape == (6, 3, 16)
    assert out.sent_emb.shape == (6, 3, 16)
    # all embeddings unit-norm
    for emb in (out.video_emb, out.para_emb):
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-5
        )


def test_flat_model_uses_clip0():
    dcfg = DataConfig(batch_size=4, feat_dim=12, vocab_size=50, max_clips=1,
                      max_frames=8, max_sentences=1, max_words=6)
    mcfg = ModelConfig(embed_size=16, word_dim=8, feat_dim=12, rnn_hidden=16,
                       hierarchical=False)
    b = _batch(dcfg, n=4)
    model = CMHSE(cfg=mcfg, vocab_size=50)
    params = model.init(jax.random.PRNGKey(0), b)["params"]
    out = model.apply({"params": params}, b)
    np.testing.assert_array_equal(
        np.asarray(out.video_emb), np.asarray(out.clip_emb[:, 0])
    )
    # no high-level params exist in the flat model
    assert "video_high" not in params and "text_high" not in params


def test_attention_pool_ignores_padding():
    pool = AttentionPool(attn_dim=8)
    rng = np.random.RandomState(0)
    states = rng.randn(2, 5, 6).astype(np.float32)
    lengths = jnp.array([3, 5], jnp.int32)
    params = pool.init(jax.random.PRNGKey(0), jnp.asarray(states), lengths)
    out1 = pool.apply(params, jnp.asarray(states), lengths)
    dirty = states.copy()
    dirty[0, 3:] = 1e4  # garbage beyond the true length
    out2 = pool.apply(params, jnp.asarray(dirty), lengths)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_attention_pool_zero_length_row_is_zero():
    pool = AttentionPool(attn_dim=4)
    states = jnp.asarray(np.random.RandomState(0).randn(1, 4, 6),
                         dtype=jnp.float32)
    lengths = jnp.array([0], jnp.int32)
    params = pool.init(jax.random.PRNGKey(0), states, jnp.array([4]))
    out = pool.apply(params, states, lengths)
    np.testing.assert_array_equal(np.asarray(out), np.zeros((1, 6)))


def test_sequence_encoder_readouts_differ():
    enc_last = SequenceEncoder(embed_size=8, rnn_hidden=8, readout="last")
    enc_mean = SequenceEncoder(embed_size=8, rnn_hidden=8, readout="mean")
    x = jnp.asarray(np.random.RandomState(1).randn(3, 6, 4),
                    dtype=jnp.float32)
    lengths = jnp.array([6, 3, 1], jnp.int32)
    p1 = enc_last.init(jax.random.PRNGKey(0), x, lengths)
    e1, states = enc_last.apply(p1, x, lengths)
    e2, _ = enc_mean.apply(p1, x, lengths)  # same params, different readout
    assert e1.shape == (3, 8)
    assert states.shape == (3, 6, 8)
    assert np.abs(np.asarray(e1) - np.asarray(e2)).max() > 1e-6


def test_reconstruction_decoder_shapes_and_teacher_forcing():
    dec = ReconstructionDecoder(embed_size=8, rnn_hidden=12)
    rng = np.random.RandomState(2)
    high = jnp.asarray(rng.randn(3, 8), dtype=jnp.float32)
    low = jnp.asarray(rng.randn(3, 4, 8), dtype=jnp.float32)
    lengths = jnp.array([4, 2, 1], jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), high, low, lengths)
    out = dec.apply(params, high, low, lengths)
    assert out.shape == (3, 4, 8)
    # step t must not depend on low[t] (teacher forcing uses t-1):
    low2 = low.at[:, 0].set(low[:, 0] + 100.0)
    out2 = dec.apply(params, high, low2, lengths)
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(out2[:, 0]), rtol=1e-5
    )


def test_bf16_forward_finite():
    dcfg = DataConfig(batch_size=4, feat_dim=12, vocab_size=50, max_clips=2,
                      max_frames=5, max_sentences=2, max_words=4)
    mcfg = ModelConfig(embed_size=16, word_dim=8, feat_dim=12, rnn_hidden=16,
                       hierarchical=True, attention_pool=True,
                       dtype="bfloat16")
    b = _batch(dcfg, n=4)
    model = CMHSE(cfg=mcfg, vocab_size=50)
    params = model.init(jax.random.PRNGKey(0), b)["params"]
    out = model.apply({"params": params}, b)
    assert out.video_emb.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out.video_emb, dtype=np.float32)).all()


def test_bidirectional_model_forward():
    dcfg = DataConfig(batch_size=4, feat_dim=12, vocab_size=50, max_clips=2,
                      max_frames=5, max_sentences=2, max_words=4)
    mcfg = ModelConfig(embed_size=16, word_dim=8, feat_dim=12, rnn_hidden=16,
                       hierarchical=True, bidirectional=True)
    b = _batch(dcfg, n=4)
    model = CMHSE(cfg=mcfg, vocab_size=50)
    params = model.init(jax.random.PRNGKey(0), b)["params"]
    out = model.apply({"params": params}, b)
    assert out.video_emb.shape == (4, 16)
    assert np.isfinite(np.asarray(out.video_emb)).all()
    # bidirectional low encoders have both direction param sets
    assert "bwd_w_i" in params["video_low"]["gru"]


def test_embedding_lookup_custom_vjp_matches_scatter():
    """The sorted-segment-sum embedding backward must equal the plain
    gather's autodiff scatter (same values up to f32 summation order),
    including repeated ids and ids never used."""
    from cmhse_tpu.models.encoders import embedding_lookup

    rng = np.random.RandomState(17)
    V, D = 50, 12
    table = jnp.asarray(rng.randn(V, D).astype(np.float32))
    ids = jnp.asarray(
        np.concatenate([rng.randint(0, V, 100), np.full(20, 7)])
        .astype(np.int32).reshape(6, 20))
    cot = jnp.asarray(rng.randn(6, 20, D).astype(np.float32))

    def loss_custom(t):
        return jnp.sum(embedding_lookup(t, ids) * cot)

    def loss_ref(t):
        return jnp.sum(jnp.take(t, ids, axis=0) * cot)

    g_custom = jax.grad(loss_custom)(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
    # forward unchanged
    np.testing.assert_array_equal(
        np.asarray(embedding_lookup(table, ids)),
        np.asarray(jnp.take(table, ids, axis=0)))
    # unused rows get exactly zero gradient
    used = set(np.asarray(ids).ravel().tolist())
    unused = [i for i in range(V) if i not in used]
    assert unused and not np.asarray(g_custom)[unused].any()


def test_reconstruction_requires_hierarchical():
    """reconstruction=True on the flat model used to be silently ignored
    (decoders built in setup, never called — the tau term just vanished);
    it must fail at config time (review r5)."""
    from cmhse_tpu.config import ModelConfig

    with pytest.raises(ValueError, match="hierarchical"):
        ModelConfig(hierarchical=False, reconstruction=True)


def test_decoder_bias_init_matches_torch_gru():
    """torch GRU reset_parameters initializes EVERY parameter — biases
    included — uniform(-1/sqrt(H), 1/sqrt(H)); the decoder must match
    MaskedGRU (review r5: zeros drifted the config-3 fresh-init
    distribution)."""
    import jax

    from cmhse_tpu.models.cmhse import ReconstructionDecoder

    dec = ReconstructionDecoder(embed_size=8, rnn_hidden=16)
    params = dec.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8)), jnp.zeros((2, 5, 8)),
        jnp.asarray([5, 3]))["params"]
    scale = 1.0 / 16**0.5
    for name in ("b_i", "b_h"):
        b = np.asarray(params[name])
        assert np.any(b != 0.0), name
        assert np.all(np.abs(b) <= scale), name
