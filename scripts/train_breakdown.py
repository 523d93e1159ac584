"""Train-step time breakdown on the real TPU (PERFORMANCE.md methodology).

In-graph scan probes at the flagship B=64 train shapes (setup shared with
bench.bench_train_step via bench._build_train_parts, so these probes always
measure exactly the headline configuration):

  fwd_loss   forward + loss                   (scalar loss fetched)
  full_step  fwd + backward + clip + Adam     (params/opt threaded in carry)
  optimizer  clip + Adam alone                (synthetic grads, fresh values)

full_step - fwd_loss - optimizer ~= the backward pass. A grad-only probe
(summing every grad leaf) is deliberately NOT used: the extra all-leaf
reduction changes XLA's scheduling enough to VMEM-OOM the backward kernel's
pipeline in a way the real train graph never does (observed on v5e).

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
from bench import _build_train_parts, _timed_scan


def main():
    bench._enable_compile_cache()
    from cmhse_tpu.train.objective import total_loss

    cfg, model, params0, tx, opt0, batch, bsz = _build_train_parts()

    def loss_of(p, b):
        out = model.apply({"params": p}, b)
        l, _ = total_loss(out, b, cfg.loss)
        return l

    def factory_fwd(n_iters):
        @jax.jit
        def run(seed):
            def body(carry, i):
                b = batch.replace(
                    frames=batch.frames
                    + ((seed + i.astype(jnp.float32)) * 1e-3).astype(
                        batch.frames.dtype
                    )
                )
                return carry + loss_of(params0, b), None
            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iters))
            return total
        return run

    def factory_full(n_iters):
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

    def factory_opt(n_iters):
        @jax.jit
        def run(seed):
            def step(carry, i):
                params, opt_state = carry
                # synthetic grads derived from params + seed: fresh values
                # each step (relay memoization), no backward pass
                grads = jax.tree.map(
                    lambda p: p * (1e-6 * (seed + i.astype(jnp.float32))),
                    params,
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), jnp.float32(0)
            (params, _), _ = jax.lax.scan(
                step, (params0, opt0), jnp.arange(n_iters))
            return jnp.sum(jax.tree.leaves(params)[0].astype(jnp.float32))
        return run

    out = {}
    for name, fac, pair in (
        ("fwd_loss_ms", factory_fwd, (4, 16)),
        ("full_step_ms", factory_full, (2, 6)),
        ("optimizer_ms", factory_opt, (4, 16)),
    ):
        sec = _timed_scan(fac, n_iters_pair=pair)
        out[name] = round(sec * 1e3, 2)
        print(f"{name}: {out[name]} ms", flush=True)
    out["backward_ms"] = round(
        out["full_step_ms"] - out["fwd_loss_ms"] - out["optimizer_ms"], 2
    )
    out["train_pairs_per_sec"] = round(bsz / (out["full_step_ms"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
