"""Regenerate the stored golden embeddings (SURVEY.md section 4.5 parity
harness). Run manually on CPU: ``python tests/make_goldens.py``. Commit the
resulting ``tests/goldens/model_goldens.npz``.

Goldens pin: fixed synthetic inputs + fixed PRNGKey init -> video/paragraph
embeddings and both-direction retrieval ranks, for the flat, hierarchical,
and full (attention+reconstruction) model configs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from cmhse_tpu.config import DataConfig, ModelConfig
from cmhse_tpu.data import SyntheticHierarchicalDataset, batches_from_dataset
from cmhse_tpu.models import CMHSE
from cmhse_tpu.ops.ranking import retrieval_ranks
from cmhse_tpu.ops.similarity import cosine_sim

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "model_goldens.npz")

CONFIGS = {
    "flat": ModelConfig(embed_size=32, word_dim=16, feat_dim=20,
                        rnn_hidden=32, hierarchical=False),
    "hier": ModelConfig(embed_size=32, word_dim=16, feat_dim=20,
                        rnn_hidden=32, hierarchical=True),
    "full": ModelConfig(embed_size=32, word_dim=16, feat_dim=20,
                        rnn_hidden=32, hierarchical=True,
                        attention_pool=True, reconstruction=True),
}
DATA = DataConfig(batch_size=8, feat_dim=20, vocab_size=64, max_clips=3,
                  max_frames=6, max_sentences=3, max_words=5)
# the flat model requires single-slot batches (whole video = one clip)
DATA_FLAT = DataConfig(batch_size=8, feat_dim=20, vocab_size=64, max_clips=1,
                       max_frames=6, max_sentences=1, max_words=5)


def compute_train_curve():
    """BASELINE config-1 integration slice (SURVEY.md section 4.3): flat
    model, fixed data + init, 8 optimization steps -> the loss curve."""
    import jax

    from cmhse_tpu.config import ExperimentConfig, LossConfig, TrainConfig
    from cmhse_tpu.train import create_train_state, train_step

    cfg = ExperimentConfig(
        name="golden_curve",
        data=DATA_FLAT,
        model=CONFIGS["flat"].__class__(
            embed_size=32, word_dim=16, feat_dim=20, rnn_hidden=32,
            hierarchical=False,
        ),
        loss=LossConfig(low_weight=0.0, recon_weight=0.0),
        train=TrainConfig(lr=1e-3, seed=0),
    )
    ds = SyntheticHierarchicalDataset(num_videos=16, feat_dim=20,
                                      vocab_size=64, max_clips=1,
                                      max_frames=6, max_words=5, seed=11)
    batches = list(batches_from_dataset(ds, DATA_FLAT, shuffle=False))
    state = create_train_state(cfg, jax.random.PRNGKey(7), batches[0])
    losses = []
    for _ in range(4):
        for b in batches:
            state, m = train_step(state, b, cfg.loss)
            losses.append(float(m["loss"]))
    return np.asarray(losses, np.float64)


def compute():
    ds = SyntheticHierarchicalDataset(num_videos=8, feat_dim=20,
                                      vocab_size=64, max_clips=3,
                                      max_frames=6, max_words=5, seed=7)
    batch = next(iter(batches_from_dataset(ds, DATA, shuffle=False)))
    ds_flat = SyntheticHierarchicalDataset(num_videos=8, feat_dim=20,
                                           vocab_size=64, max_clips=1,
                                           max_frames=6, max_words=5, seed=7)
    batch_flat = next(iter(batches_from_dataset(ds_flat, DATA_FLAT,
                                                shuffle=False)))
    out = {}
    for name, mcfg in CONFIGS.items():
        b = batch_flat if name == "flat" else batch
        model = CMHSE(cfg=mcfg, vocab_size=DATA.vocab_size)
        params = model.init(jax.random.PRNGKey(123), b)["params"]
        o = model.apply({"params": params}, b)
        sims = cosine_sim(o.video_emb, o.para_emb)
        out[f"{name}_video_emb"] = np.asarray(o.video_emb)
        out[f"{name}_para_emb"] = np.asarray(o.para_emb)
        out[f"{name}_ranks_v2p"] = np.asarray(retrieval_ranks(sims))
        out[f"{name}_ranks_p2v"] = np.asarray(retrieval_ranks(sims.T))
    return out


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    payload = compute()
    payload["train_curve"] = compute_train_curve()
    np.savez(GOLDEN_PATH, **payload)
    print(f"wrote {GOLDEN_PATH}")
