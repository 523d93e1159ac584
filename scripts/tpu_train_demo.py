"""Flagship-scale training ON THE REAL TPU with convergence evidence.

The microbenches (bench.py) measure the train step in-graph; this script is
the end-to-end counterpart: the FULL CMHSE config (hierarchical + attention
pooling + reconstruction, E=H=1024, bf16, Pallas kernels) trained on
learnable correlated synthetic data at ActivityNet-like shapes, validating
retrieval on a held-out gallery each few epochs.

Relay-aware design (PERFORMANCE.md "Measurement pitfalls"): per-step
dispatch through the axon tunnel costs far more than the 9 ms step, so the
epoch runs as ONE jitted ``lax.scan`` over device-resident stacked batches
(a legitimate production pattern for precomputed-feature workloads: the
whole train split fits HBM many times over). Feature upload happens once,
in bf16 (half the tunnel traffic).

Run: ``python scripts/tpu_train_demo.py`` (real TPU, ~5 min incl. compile).
Results recorded in PERFORMANCE.md "Flagship-scale training on hardware".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from cmhse_tpu.config import (DataConfig, ExperimentConfig, LossConfig,
                              ModelConfig, TrainConfig)
from cmhse_tpu.data import CorrelatedSyntheticDataset, batches_from_dataset
from cmhse_tpu.eval.retrieval import format_table, validate_metrics
from cmhse_tpu.models import CMHSE
from cmhse_tpu.train import create_train_state
from cmhse_tpu.train.objective import total_loss
from cmhse_tpu.train.state import set_learning_rate


def main():
    import bench  # compile cache

    bench._enable_compile_cache()

    bsz = 64
    epochs = int(os.environ.get("EPOCHS", "30"))
    ds_kw = dict(feat_dim=500, vocab_size=10000, max_clips=8, max_frames=64,
                 max_words=32, num_topics=50)
    cfg = ExperimentConfig(
        name="tpu_train_demo",
        data=DataConfig(batch_size=bsz, feat_dim=500, vocab_size=10000,
                        max_clips=8, max_frames=64, max_sentences=8,
                        max_words=32, feature_dtype="bfloat16"),
        model=ModelConfig(embed_size=1024, word_dim=300, feat_dim=500,
                          rnn_hidden=1024, hierarchical=True,
                          attention_pool=True, reconstruction=True,
                          dtype="bfloat16", pallas_gru=True),
        loss=LossConfig(),
        train=TrainConfig(num_epochs=epochs, lr=1e-3, lr_update=20),
    )

    print("generating correlated synthetic data...", flush=True)
    train_ds = CorrelatedSyntheticDataset(num_videos=512, seed=0, **ds_kw)
    val_ds = CorrelatedSyntheticDataset(num_videos=192, seed=99, **ds_kw)

    train_batches = list(batches_from_dataset(train_ds, cfg.data,
                                              shuffle=True, seed=0))
    val_batches = list(batches_from_dataset(val_ds, cfg.data, shuffle=False))
    n_steps = len(train_batches)

    print(f"uploading {n_steps} train batches (bf16 features)...", flush=True)
    stacked = jax.device_put(
        jax.tree.map(lambda *xs: jnp.stack(xs), *train_batches)
    )
    val_batches = [jax.device_put(b) for b in val_batches]

    state = create_train_state(cfg, jax.random.PRNGKey(0), train_batches[0])
    model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)

    import optax

    @jax.jit
    def train_epoch(state, batches):
        """One dispatch per epoch: scan the full update over the stacked,
        device-resident batches."""

        def step(st, batch):
            def loss_fn(params):
                outputs = st.apply_fn({"params": params}, batch)
                return total_loss(outputs, batch, cfg.loss)

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st.params
            )
            updates, opt_state = st.tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return st.replace(step=st.step + 1, params=params,
                              opt_state=opt_state), loss

        state, losses = jax.lax.scan(step, state, batches)
        return state, jnp.mean(losses)

    print("compiling + training...", flush=True)
    history = []
    pairs_per_sec = None
    for epoch in range(epochs):
        lr = cfg.train.lr * (
            cfg.train.lr_decay ** (epoch // cfg.train.lr_update)
        )
        state = set_learning_rate(state, lr)
        t0 = time.perf_counter()
        state, mean_loss = train_epoch(state, stacked)
        mean_loss = float(mean_loss)  # fences the epoch (ADVICE round 1)
        dt = time.perf_counter() - t0
        if epoch >= 1:  # first epoch includes compile
            pairs = n_steps * bsz
            pps = pairs / dt
            pairs_per_sec = pps if pairs_per_sec is None else max(
                pairs_per_sec, pps
            )
        if epoch % 5 == 4 or epoch == epochs - 1 or epoch == 0:
            m = validate_metrics(model, state.params, val_batches)
            history.append((epoch + 1, mean_loss, m["rsum"]))
            print(f"epoch {epoch+1:3d}  loss {mean_loss:.4f}  "
                  f"val rsum {m['rsum']:.1f}  ({dt*1e3:.0f} ms/epoch)",
                  flush=True)

    print(format_table(m))
    chance_r1 = 100.0 / 192
    print(f"\nheld-out gallery: 192 videos (chance R@1 {chance_r1:.2f}%)")
    print(f"best sustained in-loop throughput: {pairs_per_sec:.0f} pairs/s "
          f"({n_steps} steps/dispatch, B={bsz})")
    assert history[-1][2] > history[0][2] * 2, "no convergence"
    print("TPU TRAIN DEMO OK")


if __name__ == "__main__":
    main()
