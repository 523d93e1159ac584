"""Config-3 (attention + reconstruction) train-step probe: decoder GRUs on
the scan path vs the seeded-h0 Pallas path (VERDICT r2 weak 2 / next-step 8).

The encoders run the fused kernels in BOTH measurements (pallas_gru=True);
only the two ReconstructionDecoder time loops flip, so the delta isolates
the decoder routing. Run on an idle host: `python scripts/recon_profile.py`.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import bench
from bench import _timed_scan


def _build():
    from cmhse_tpu.config import (DataConfig, ExperimentConfig, LossConfig,
                                  ModelConfig, TrainConfig)
    from cmhse_tpu.data.bucketing import BucketSpec, pad_batch
    from cmhse_tpu.data.datasets import SyntheticHierarchicalDataset
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.train.state import make_optimizer

    bsz = 64
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=bsz, feat_dim=bench.FEAT_DIM,
                        vocab_size=bench.VOCAB, max_clips=bench.MAX_CLIPS,
                        max_frames=bench.MAX_FRAMES,
                        max_sentences=bench.MAX_SENTENCES,
                        max_words=bench.MAX_WORDS),
        model=ModelConfig(embed_size=bench.EMBED, word_dim=bench.WORD_DIM,
                          feat_dim=bench.FEAT_DIM, rnn_hidden=bench.HIDDEN,
                          hierarchical=True, attention_pool=True,
                          reconstruction=True, dtype="bfloat16",
                          pallas_gru=True),
        loss=LossConfig(recon_weight=5e-4),
        train=TrainConfig(),
    )
    ds = SyntheticHierarchicalDataset(
        num_videos=bsz, feat_dim=bench.FEAT_DIM, vocab_size=bench.VOCAB,
        max_clips=bench.MAX_CLIPS, max_frames=bench.MAX_FRAMES,
        max_words=bench.MAX_WORDS,
    )
    spec = BucketSpec(batch_size=bsz, max_clips=bench.MAX_CLIPS,
                      max_frames=bench.MAX_FRAMES,
                      max_sentences=bench.MAX_SENTENCES,
                      max_words=bench.MAX_WORDS, feat_dim=bench.FEAT_DIM,
                      feature_dtype="bfloat16")
    batch = jax.device_put(pad_batch([ds[i] for i in range(bsz)], spec))

    model = CMHSE(cfg=cfg.model, vocab_size=bench.VOCAB)
    params0 = model.init(jax.random.PRNGKey(0), batch)["params"]
    tx = make_optimizer(cfg)
    return cfg, model, params0, tx, tx.init(params0), batch, bsz


def _factory(cfg, model, params0, tx, opt0, batch):
    from cmhse_tpu.train.objective import total_loss

    def loss_of(p, b):
        out = model.apply({"params": p}, b)
        l, _ = total_loss(out, b, cfg.loss)
        return l

    def factory(n_iters):
        @jax.jit
        def run(seed):
            def step(carry, i):
                params, opt_state = carry
                b = batch.replace(
                    frames=batch.frames
                    + ((seed + i.astype(jnp.float32)) * 1e-3).astype(
                        batch.frames.dtype
                    )
                )
                loss, grads = jax.value_and_grad(loss_of)(params, b)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss
            (params, _), losses = jax.lax.scan(
                step, (params0, opt0), jnp.arange(n_iters))
            return jnp.sum(losses) + jnp.sum(
                jax.tree.leaves(params)[0].astype(jnp.float32))
        return run

    return factory


def main():
    bench._enable_compile_cache()
    from cmhse_tpu.models import cmhse as cmhse_mod

    out = {}
    # Flip the routing via the module-level gate, and KEEP the override
    # active through the timed region: flax re-runs setup() on every
    # apply, so a patch restored after model.init silently reverts the
    # routing inside the jit trace (exactly the bug an earlier version of
    # this script had — both legs measured the same path).
    for name, min_t in (("decoder_scan", 10**9), ("decoder_pallas", 0)):
        old = cmhse_mod.DECODER_PALLAS_MIN_T
        cmhse_mod.DECODER_PALLAS_MIN_T = min_t
        try:
            cfg, model, params0, tx, opt0, batch, bsz = _build()
            sec = _timed_scan(
                _factory(cfg, model, params0, tx, opt0, batch),
                n_iters_pair=(2, 6),
            )
        finally:
            cmhse_mod.DECODER_PALLAS_MIN_T = old
        out[f"{name}_ms"] = round(sec * 1e3, 2)
        out[f"{name}_pairs_per_sec"] = round(bsz / sec, 1)
        print(f"{name}: {out[f'{name}_ms']} ms/step "
              f"({out[f'{name}_pairs_per_sec']} pairs/s)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
