"""Train-step time breakdown on the real TPU (PERFORMANCE.md methodology).

Three in-graph scan probes at B=64 flagship train shapes:
  A  forward + loss                          (scalar loss fetched)
  B  A + full backward (sum over ALL grad leaves — nothing DCE-able)
  C  full train step: B + clip + Adam (params/opt threaded through carry)

B-A isolates the backward pass; C-B isolates clip+Adam+carry threading.
Run on an idle host (no concurrent pytest): `python scripts/train_breakdown.py`.
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


def main():
    bench._enable_compile_cache()

    # reuse bench_train_step's setup by inlining its construction
    from cmhse_tpu.config import (DataConfig, ExperimentConfig, LossConfig,
                                  ModelConfig, TrainConfig)
    from cmhse_tpu.data.bucketing import BucketSpec, pad_batch
    from cmhse_tpu.data.datasets import SyntheticHierarchicalDataset
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.train.objective import total_loss
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
                          hierarchical=True, dtype="bfloat16",
                          pallas_gru=True),
        loss=LossConfig(),
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
                      max_words=bench.MAX_WORDS, feat_dim=bench.FEAT_DIM)
    batch = jax.device_put(pad_batch([ds[i] for i in range(bsz)], spec))
    model = CMHSE(cfg=cfg.model, vocab_size=bench.VOCAB)
    params0 = model.init(jax.random.PRNGKey(0), batch)["params"]
    tx = make_optimizer(cfg)
    opt0 = tx.init(params0)

    def loss_of(p, b):
        out = model.apply({"params": p}, b)
        l, _ = total_loss(out, b, cfg.loss)
        return l

    def factory_fwd(n_iters):
        @jax.jit
        def run(seed):
            def body(carry, i):
                b = batch.replace(
                    frames=batch.frames + (seed + i.astype(jnp.float32)) * 1e-3
                )
                return carry + loss_of(params0, b), None
            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iters))
            return total
        return run

    def factory_grad(n_iters):
        @jax.jit
        def run(seed):
            def body(carry, i):
                b = batch.replace(
                    frames=batch.frames + (seed + i.astype(jnp.float32)) * 1e-3
                )
                loss, grads = jax.value_and_grad(loss_of)(params0, b)
                gsum = sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree.leaves(grads))
                return carry + loss + gsum, None
            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iters))
            return total
        return run

    def factory_full(n_iters):
        @jax.jit
        def run(seed):
            def step(carry, i):
                params, opt_state = carry
                b = batch.replace(
                    frames=batch.frames + (seed + i.astype(jnp.float32)) * 1e-3
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

    out = {}
    for name, fac, pair in (
        ("fwd_loss_ms", factory_fwd, (4, 16)),
        ("fwd_bwd_ms", factory_grad, (3, 9)),
        ("full_step_ms", factory_full, (2, 6)),
    ):
        sec = _timed_scan(fac, n_iters_pair=pair)
        out[name] = round(sec * 1e3, 2)
        print(f"{name}: {out[name]} ms", flush=True)
    out["backward_ms"] = round(out["fwd_bwd_ms"] - out["fwd_loss_ms"], 2)
    out["optimizer_ms"] = round(out["full_step_ms"] - out["fwd_bwd_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
