"""Train state + jitted update step (rebuilds ``train_emb`` of the reference
wrapper, SURVEY.md C9: forward, loss, backward, grad-clip ~2.0, Adam step).

TPU-first: the whole update is ONE jitted function — forward, loss, grads,
global-norm clip, Adam — so XLA fuses it end to end; under a sharded mesh the
gradient all-reduce is inserted by the partitioner and rides ICI
(SURVEY.md section 2b/2c).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from cmhse_tpu.config import ExperimentConfig
from cmhse_tpu.data.batch import Batch
from cmhse_tpu.models.cmhse import CMHSE
from cmhse_tpu.train.objective import total_loss


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    # static fields
    apply_fn: Any = struct.field(pytree_node=False)
    tx: Any = struct.field(pytree_node=False)


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    """Adam + global-norm clip + stepwise lr schedule (reference: Adam with
    clip_grad_norm(2.0) and lr/10 every ``lr_update`` epochs, SURVEY.md C10)."""
    t = cfg.train
    # lr decay is an EPOCH-level policy (reference: /10 every lr_update
    # epochs) and steps-per-epoch isn't known here, so the lr is an injected
    # hyperparameter the loop rewrites each epoch (set_learning_rate +
    # loop.adjust_learning_rate).
    return optax.chain(
        optax.clip_by_global_norm(t.grad_clip),
        optax.inject_hyperparams(optax.adam)(learning_rate=t.lr),
    )


def create_train_state(
    cfg: ExperimentConfig, rng: jax.Array, sample_batch: Batch,
    model: CMHSE | None = None
) -> TrainState:
    """``model``: pass an existing CMHSE instance so the caller's module
    and the state's ``apply_fn`` are ONE object (fit() validates through
    the module it passes here); built from cfg when omitted."""
    if model is None:
        model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)
    params = model.init(rng, sample_batch)["params"]
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        apply_fn=model.apply,
        tx=tx,
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Reference ``adjust_learning_rate``: lr /= 10 every lr_update epochs."""
    opt_state = state.opt_state
    inner = opt_state[1]  # inject_hyperparams state
    inner = inner._replace(hyperparams={**inner.hyperparams,
                                        "learning_rate": jnp.asarray(lr)})
    return state.replace(opt_state=(opt_state[0], inner))


def _update(
    state: TrainState, batch: Batch, loss_cfg
) -> tuple[TrainState, dict[str, jax.Array]]:
    """One optimization step (shared body of train_step / train_steps)."""

    def loss_fn(params):
        outputs = state.apply_fn({"params": params}, batch)
        return total_loss(outputs, batch, loss_cfg)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    metrics["grad_norm"] = optax.global_norm(grads)
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1, params=params, opt_state=opt_state
    )
    return new_state, metrics


@partial(jax.jit, static_argnames=("loss_cfg",), donate_argnames=("state",))
def train_step(
    state: TrainState, batch: Batch, loss_cfg
) -> tuple[TrainState, dict[str, jax.Array]]:
    """One optimization step; returns (new_state, metrics)."""
    return _update(state, batch, loss_cfg)


@partial(jax.jit, static_argnames=("loss_cfg",), donate_argnames=("state",))
def train_steps(
    state: TrainState, stacked: Batch, loss_cfg
) -> tuple[TrainState, dict[str, jax.Array]]:
    """K optimization steps in ONE dispatch: ``lax.scan`` of the update over
    a stacked ``Batch`` whose leaves carry a leading ``[K, ...]`` axis.

    Identical math/order to K ``train_step`` calls; the value is dispatch
    amortization (each host->device dispatch costs ~100 us on an attached
    TPU VM and tens of ms through a network relay — see PERFORMANCE.md
    "Flagship-scale training on hardware"). Metrics come back with a
    leading ``[K]`` axis.
    """
    return jax.lax.scan(
        lambda st, b: _update(st, b, loss_cfg), state, stacked
    )
