"""Full-model cross-framework parity harness (BASELINE.json:5 "reproduces its
embeddings"; SURVEY.md hard part 1 beyond the GRU cell).

A live torch.nn replica of the reference model (tests/torch_replica.py:
4 packed-sequence GRUs + joint Linear + l2norm + VSE++ loss + tau recon
decoder) is initialized randomly, its weights are transplanted into the JAX
model via cmhse_tpu.interop (the documented [3H,D] -> [D,3H] mapping), and we
pin, for flat / hierarchical / full configs:

  * video & paragraph embeddings element-wise <= 1e-5,
  * low-level clip & sentence embeddings on valid slots <= 1e-5,
  * retrieval ranks EXACT (hence identical R@k),
  * total training loss (high + low + tau*recon) <= 1e-5.

The transplant goes through a state_dict round-trip, so a real reference
checkpoint with these tensor layouts would load through the same path
unchanged.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_replica import (  # noqa: E402 (tests dir on sys.path via pytest)
    TorchCMHSE,
    recon_loss_t,
    vsepp_loss_t,
)

from cmhse_tpu.config import LossConfig, ModelConfig
from cmhse_tpu.data.bucketing import BucketSpec, pad_batch
from cmhse_tpu.data.datasets import RaggedExample
from cmhse_tpu.interop import (
    embedding_params_from_torch,
    recon_decoder_params_from_torch,
    sequence_encoder_params_from_torch,
)
from cmhse_tpu.models import CMHSE
from cmhse_tpu.ops.ranking import retrieval_ranks
from cmhse_tpu.train.objective import total_loss

VOCAB, WORD_DIM, FEAT = 50, 12, 16
HIDDEN, EMBED = 20, 24  # hidden != embed so the joint Linear exists
MARGIN = 0.2
TAU = 5e-4

CONFIGS = {
    "flat": dict(hierarchical=False, attention_pool=False,
                 reconstruction=False),
    "hier": dict(hierarchical=True, attention_pool=False,
                 reconstruction=False),
    "full": dict(hierarchical=True, attention_pool=True,
                 reconstruction=True),
    # pins the *_reverse weight mapping end-to-end (VERDICT r2 missing 6):
    # the one interop layout branch a real checkpoint could hit that the
    # other configs never exercise
    "bidir": dict(hierarchical=True, attention_pool=False,
                  reconstruction=False, bidirectional=True),
}


def _make_batch(hierarchical: bool, rng: np.random.RandomState,
                n_examples=7, batch_size=8):
    """Ragged examples (1:1 clip/sentence alignment, ActivityNet-style) padded
    into a fixed-shape Batch with one invalid padding row."""
    cmax = 3 if hierarchical else 1
    fmax, wmax = 5, 4
    examples = []
    for i in range(n_examples):
        ncl = rng.randint(1, cmax + 1)
        clips = [
            rng.randn(rng.randint(1, fmax + 1), FEAT).astype(np.float32)
            for _ in range(ncl)
        ]
        sents = [
            rng.randint(4, VOCAB, size=rng.randint(1, wmax + 1)).astype(
                np.int32
            )
            for _ in range(ncl)
        ]
        examples.append(
            RaggedExample(video_id=i, clips=clips, sentences=sents)
        )
    spec = BucketSpec(batch_size=batch_size, max_clips=cmax, max_frames=fmax,
                      max_sentences=cmax, max_words=wmax, feat_dim=FEAT)
    return pad_batch(examples, spec)


def _encoder_params(tenc):
    gru = {k: v.detach().numpy() for k, v in tenc.gru.state_dict().items()}
    proj = (
        (tenc.proj.weight.detach().numpy(), tenc.proj.bias.detach().numpy())
        if tenc.proj is not None else None
    )
    attn_proj = attn_score = None
    if tenc.readout == "attn":
        attn_proj = (tenc.attn_proj.weight.detach().numpy(),
                     tenc.attn_proj.bias.detach().numpy())
        attn_score = tenc.attn_score.weight.detach().numpy()
    return sequence_encoder_params_from_torch(gru, proj, attn_proj,
                                              attn_score)


def _decoder_params(tdec):
    gru = {k: v.detach().numpy() for k, v in tdec.gru.state_dict().items()}
    return recon_decoder_params_from_torch(
        (tdec.init.weight.detach().numpy(), tdec.init.bias.detach().numpy()),
        gru,
        (tdec.out.weight.detach().numpy(), tdec.out.bias.detach().numpy()),
    )


def _transplant(tm: TorchCMHSE, params: dict) -> dict:
    new = dict(params)
    new["word_embedding"] = embedding_params_from_torch(
        tm.embedding.weight.detach().numpy()
    )
    new["video_low"] = _encoder_params(tm.video_low)
    new["text_low"] = _encoder_params(tm.text_low)
    if tm.hierarchical:
        new["video_high"] = _encoder_params(tm.video_high)
        new["text_high"] = _encoder_params(tm.text_high)
    if tm.reconstruction:
        new["video_decoder"] = _decoder_params(tm.video_decoder)
        new["text_decoder"] = _decoder_params(tm.text_decoder)
    return new


def _build(config_name: str, seed: int = 0):
    flags = CONFIGS[config_name]
    rng = np.random.RandomState(seed)
    batch = _make_batch(flags["hierarchical"], rng)

    torch.manual_seed(seed)
    tm = TorchCMHSE(VOCAB, WORD_DIM, FEAT, HIDDEN, EMBED, **flags)
    # state_dict round-trip: the exact path a reference .pth would take
    state = {k: v.clone() for k, v in tm.state_dict().items()}
    tm2 = TorchCMHSE(VOCAB, WORD_DIM, FEAT, HIDDEN, EMBED, **flags)
    tm2.load_state_dict(state)

    mcfg = ModelConfig(embed_size=EMBED, word_dim=WORD_DIM, feat_dim=FEAT,
                       rnn_hidden=HIDDEN, **flags)
    model = CMHSE(cfg=mcfg, vocab_size=VOCAB)
    params = model.init(jax.random.PRNGKey(1), batch)["params"]
    params = _transplant(tm2, jax.tree.map(np.asarray, dict(params)))
    return tm2, model, params, batch


@pytest.mark.parametrize("config_name", list(CONFIGS))
def test_embeddings_match_torch_replica(config_name):
    tm, model, params, batch = _build(config_name)
    out = model.apply({"params": params}, batch)

    with torch.no_grad():
        tv, tclip = tm.encode_video(
            np.asarray(batch.frames), np.asarray(batch.frame_len),
            np.asarray(batch.clip_len),
        )
        tp, tsent = tm.encode_text(
            np.asarray(batch.words), np.asarray(batch.word_len),
            np.asarray(batch.sent_len),
        )

    valid = np.asarray(batch.valid)
    np.testing.assert_allclose(
        np.asarray(out.video_emb)[valid], tv.numpy()[valid],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.para_emb)[valid], tp.numpy()[valid],
        rtol=1e-5, atol=1e-5,
    )
    cmask = np.asarray(batch.clip_valid())
    smask = np.asarray(batch.sent_valid())
    np.testing.assert_allclose(
        np.asarray(out.clip_emb)[cmask], tclip.numpy()[cmask],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.sent_emb)[smask], tsent.numpy()[smask],
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("config_name", list(CONFIGS))
def test_ranks_exact_vs_torch_replica(config_name):
    tm, model, params, batch = _build(config_name)
    out = model.apply({"params": params}, batch)
    valid = np.asarray(batch.valid)

    with torch.no_grad():
        tv, _ = tm.encode_video(
            np.asarray(batch.frames), np.asarray(batch.frame_len),
            np.asarray(batch.clip_len),
        )
        tp, _ = tm.encode_text(
            np.asarray(batch.words), np.asarray(batch.word_len),
            np.asarray(batch.sent_len),
        )
    tsims = (tv.numpy()[valid] @ tp.numpy()[valid].T).astype(np.float32)
    jsims = np.asarray(
        jnp.dot(out.video_emb[jnp.asarray(valid)],
                out.para_emb[jnp.asarray(valid)].T,
                preferred_element_type=jnp.float32)
    )

    for sims_v2p in (False, True):
        t_s = tsims.T if sims_v2p else tsims
        j_s = jsims.T if sims_v2p else jsims
        t_ranks = 1 + (t_s > np.diag(t_s)[:, None]).sum(axis=1)
        j_ranks = np.asarray(retrieval_ranks(jnp.asarray(j_s)))
        np.testing.assert_array_equal(j_ranks, t_ranks)


@pytest.mark.parametrize("config_name", list(CONFIGS))
def test_loss_matches_torch_replica(config_name):
    tm, model, params, batch = _build(config_name)
    flags = CONFIGS[config_name]
    low_w = 1.0 if flags["hierarchical"] else 0.0
    tau = TAU if flags["reconstruction"] else 0.0
    lcfg = LossConfig(margin=MARGIN, max_violation=True, low_weight=low_w,
                      high_weight=1.0, recon_weight=tau, use_pallas=False)

    out = model.apply({"params": params}, batch)
    jax_loss, metrics = total_loss(out, batch, lcfg)

    valid = np.asarray(batch.valid)
    with torch.no_grad():
        tv, tclip = tm.encode_video(
            np.asarray(batch.frames), np.asarray(batch.frame_len),
            np.asarray(batch.clip_len),
        )
        tp, tsent = tm.encode_text(
            np.asarray(batch.words), np.asarray(batch.word_len),
            np.asarray(batch.sent_len),
        )
        t_total = vsepp_loss_t(tv[valid], tp[valid], MARGIN)
        if low_w:
            cmask = np.asarray(batch.clip_valid()).reshape(-1)
            smask = np.asarray(batch.sent_valid()).reshape(-1)
            both = cmask & smask
            clips = tclip.reshape(-1, EMBED)[both]
            sents = tsent.reshape(-1, EMBED)[both]
            t_total = t_total + low_w * vsepp_loss_t(clips, sents, MARGIN)
        if tau:
            cmask2 = np.asarray(batch.clip_valid())
            smask2 = np.asarray(batch.sent_valid())
            vrec = tm.video_decoder(tv, tclip)
            trec = tm.text_decoder(tp, tsent)
            t_total = t_total + tau * (
                recon_loss_t(vrec, tclip, cmask2)
                + recon_loss_t(trec, tsent, smask2)
            )

    np.testing.assert_allclose(float(jax_loss), float(t_total),
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(float(metrics["loss_high"]))


def test_recon_outputs_match_torch_replica():
    """Decoder parity on valid steps (torch runs unmasked full length; steps
    t < clip_len see identical inputs, and the loss masks the rest). Only
    the "full" config has decoders, so this is unparametrized (VERDICT r2
    weak 7: the old ["hier"] parametrize lied about what ran)."""
    tm, model, params, batch = _build("full")
    out = model.apply({"params": params}, batch)
    with torch.no_grad():
        tv, tclip = tm.encode_video(
            np.asarray(batch.frames), np.asarray(batch.frame_len),
            np.asarray(batch.clip_len),
        )
        vrec = tm.video_decoder(tv, tclip).numpy()
    cmask = np.asarray(batch.clip_valid())
    np.testing.assert_allclose(
        np.asarray(out.video_recon)[cmask], vrec[cmask],
        rtol=1e-5, atol=1e-5,
    )
