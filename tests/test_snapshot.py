"""Preemption-safe mid-epoch snapshots (``TrainConfig.snapshot_step``).

The reference checkpoints once per epoch (SURVEY.md section 5: torch.save
each epoch), so a mid-epoch kill redoes the whole epoch. On TPU pods
preemption is routine, so the rebuild adds step-cadence snapshots that
record the consumed-group offset; a resume must reproduce the
uninterrupted run EXACTLY — same batches, same order, same math.
"""

import dataclasses
import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp
import pytest

from cmhse_tpu.config import (DataConfig, ExperimentConfig, LossConfig,
                              ModelConfig, TrainConfig)
from cmhse_tpu.data import SyntheticHierarchicalDataset, batches_from_dataset
from cmhse_tpu.train import create_train_state
from cmhse_tpu.train.checkpoint import CheckpointManager
import cmhse_tpu.train.loop as loop_mod
from cmhse_tpu.train.loop import fit


class Preempted(RuntimeError):
    """Simulated pod preemption: the process dies mid-epoch, with no chance
    to run the end-of-epoch save."""


def _cfg(ckpt_dir, **train_overrides):
    train = dict(num_epochs=2, lr=1e-3, lr_update=1, val_step=0, log_step=100,
                 checkpoint_dir=str(ckpt_dir))
    train.update(train_overrides)
    return ExperimentConfig(
        name="snap",
        data=DataConfig(batch_size=8, feat_dim=16, vocab_size=64,
                        max_clips=2, max_frames=6, max_sentences=2,
                        max_words=6),
        model=ModelConfig(embed_size=24, word_dim=12, feat_dim=16,
                          rnn_hidden=24, hierarchical=True),
        loss=LossConfig(),
        train=TrainConfig(**train),
    )


def _ds(n=24, seed=0):
    return SyntheticHierarchicalDataset(num_videos=n, feat_dim=16,
                                        vocab_size=64, max_clips=2,
                                        max_frames=6, max_words=6, seed=seed)


def _assert_states_identical(a, b):
    assert int(a.step) == int(b.step) > 0
    for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for oa, ob in zip(jax.tree.leaves(a.opt_state),
                      jax.tree.leaves(b.opt_state)):
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def _kill_after(monkeypatch, attr, n_calls):
    """Patch loop-module ``attr`` (train_step / train_steps) to raise
    Preempted before its (n_calls+1)-th invocation."""
    real = getattr(loop_mod, attr)
    count = {"n": 0}

    def killer(state, batch, loss_cfg):
        if count["n"] >= n_calls:
            raise Preempted()
        count["n"] += 1
        return real(state, batch, loss_cfg)

    monkeypatch.setattr(loop_mod, attr, killer)


def test_kill_and_resume_matches_uninterrupted_run(tmp_path, monkeypatch):
    """Kill after 4 of 6 steps (mid epoch 1), resume: bitwise-identical
    final params/opt_state to the run that was never interrupted."""
    # 24 videos / batch 8 = 3 steps per epoch, 2 epochs
    state_a, _ = fit(_cfg(tmp_path / "a", snapshot_step=1), _ds(), None)

    cfg_b = _cfg(tmp_path / "b", snapshot_step=1)
    _kill_after(monkeypatch, "train_step", 4)
    with pytest.raises(Preempted):
        fit(cfg_b, _ds(), None)
    monkeypatch.undo()

    # the crash left a step-4 snapshot pointing INTO epoch 1 (1 group done)
    sample = next(iter(batches_from_dataset(_ds(), cfg_b.data, shuffle=False,
                                            fixed_shape=True)))
    probe = create_train_state(cfg_b, jax.random.PRNGKey(0), sample)
    _, epoch, _, groups_done = CheckpointManager(
        cfg_b.train.checkpoint_dir).restore(probe)
    assert (epoch, groups_done) == (1, 1)

    cfg_b2 = dataclasses.replace(
        cfg_b, train=dataclasses.replace(
            cfg_b.train, resume=cfg_b.train.checkpoint_dir))
    state_b, _ = fit(cfg_b2, _ds(), None)
    _assert_states_identical(state_a, state_b)

    events = [json.loads(l) for l in
              open(os.path.join(cfg_b.train.checkpoint_dir, "log.jsonl"))]
    resumes = [e for e in events if e.get("event") == "resume_mid_epoch"]
    assert resumes and resumes[-1]["groups"] == 1


def test_kill_and_resume_multi_step_dispatch(tmp_path, monkeypatch):
    """Same contract under steps_per_dispatch>1: snapshots land on dispatch
    boundaries and group skipping counts dispatch groups, not steps."""
    over = dict(snapshot_step=1, steps_per_dispatch=2)
    state_a, _ = fit(_cfg(tmp_path / "a", **over), _ds(), None)

    # 3 steps/epoch at spd=2 -> groups of [2, 1] steps; kill before epoch 1's
    # second group (after 3 of 4 dispatches)
    cfg_b = _cfg(tmp_path / "b", **over)
    _kill_after(monkeypatch, "train_steps", 3)
    with pytest.raises(Preempted):
        fit(cfg_b, _ds(), None)
    monkeypatch.undo()

    cfg_b2 = dataclasses.replace(
        cfg_b, train=dataclasses.replace(
            cfg_b.train, resume=cfg_b.train.checkpoint_dir))
    state_b, _ = fit(cfg_b2, _ds(), None)
    _assert_states_identical(state_a, state_b)


def test_sigterm_snapshots_and_exits_cleanly(tmp_path, monkeypatch):
    """Graceful preemption: with snapshots on, SIGTERM mid-epoch makes fit()
    finish the in-flight group, write a resumable snapshot, and RETURN (no
    exception) — and the resumed run still matches the uninterrupted one."""
    import signal

    state_a, _ = fit(_cfg(tmp_path / "a", snapshot_step=100), _ds(), None)

    # deliver SIGTERM during step 4 of 6 (snapshot cadence never fires at
    # snapshot_step=100 — only the preemption path writes the checkpoint)
    real = loop_mod.train_step
    count = {"n": 0}

    def sender(state, batch, loss_cfg):
        count["n"] += 1
        if count["n"] == 4:
            os.kill(os.getpid(), signal.SIGTERM)
        return real(state, batch, loss_cfg)

    monkeypatch.setattr(loop_mod, "train_step", sender)
    disposition_before = signal.getsignal(signal.SIGTERM)
    cfg_b = _cfg(tmp_path / "b", snapshot_step=100)
    state_mid, _ = fit(cfg_b, _ds(), None)
    monkeypatch.undo()
    assert int(state_mid.step) == 4  # exited after the in-flight group
    # fit() restored the previous SIGTERM disposition on the way out
    assert signal.getsignal(signal.SIGTERM) is disposition_before

    events = [json.loads(l) for l in
              open(os.path.join(cfg_b.train.checkpoint_dir, "log.jsonl"))]
    pre = [e for e in events if e.get("event") == "preempt_exit"]
    assert pre and pre[-1]["groups_done"] == 1 and pre[-1]["epoch"] == 1

    cfg_b2 = dataclasses.replace(
        cfg_b, train=dataclasses.replace(
            cfg_b.train, resume=cfg_b.train.checkpoint_dir))
    state_b, _ = fit(cfg_b2, _ds(), None)
    _assert_states_identical(state_a, state_b)


def test_epoch_end_save_overwrites_same_step_snapshot(tmp_path):
    """snapshot_step=1 snapshots after EVERY step, including each epoch's
    last — the epoch-end save then rewrites the same optimizer step and must
    win (epoch advanced, groups_done reset)."""
    cfg = _cfg(tmp_path / "run", snapshot_step=1, num_epochs=1)
    fit(cfg, _ds(), None)

    sample = next(iter(batches_from_dataset(_ds(), cfg.data, shuffle=False,
                                            fixed_shape=True)))
    probe = create_train_state(cfg, jax.random.PRNGKey(0), sample)
    restored, epoch, _, groups_done = CheckpointManager(
        cfg.train.checkpoint_dir).restore(probe)
    assert int(restored.step) == 3
    assert (epoch, groups_done) == (1, 0)


def test_restore_accepts_pre_snapshot_layout(tmp_path):
    """Checkpoints written before the groups_done key existed must restore
    (groups_done defaults to 0 = epoch boundary)."""
    cfg = _cfg(tmp_path / "run")
    sample = next(iter(batches_from_dataset(_ds(8), cfg.data, shuffle=False,
                                            fixed_shape=True)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), sample)

    mgr = CheckpointManager(str(tmp_path / "run"), cfg)
    legacy = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(7, np.int64),
        "epoch": np.asarray(2, np.int64),
        "best_rsum": np.asarray(1.5, np.float64),
    }
    mgr._mgr.save(7, args=ocp.args.StandardSave(legacy))
    mgr._mgr.wait_until_finished()

    restored, epoch, best_rsum, groups_done = mgr.restore(state)
    assert (epoch, best_rsum, groups_done) == (2, 1.5, 0)
    assert int(restored.step) == 7
    mgr.close()
