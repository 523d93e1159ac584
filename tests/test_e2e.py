"""Integration slice (SURVEY.md section 4.3): small synthetic run through the
full ``fit`` loop with validation, checkpoint best-save, and resume."""

import glob
import os

import chex
import numpy as np
import jax
import pytest

from cmhse_tpu.config import (DataConfig, ExperimentConfig, LossConfig,
                              ModelConfig, TrainConfig)
from cmhse_tpu.data import SyntheticHierarchicalDataset, batches_from_dataset
from cmhse_tpu.eval.retrieval import validate_metrics, format_table
from cmhse_tpu.models import CMHSE
from cmhse_tpu.train import create_train_state
from cmhse_tpu.train.checkpoint import CheckpointManager, restore_for_eval
from cmhse_tpu.train.loop import adjust_learning_rate, fit


def _cfg(tmp_path, epochs=2):
    return ExperimentConfig(
        name="e2e",
        data=DataConfig(batch_size=8, feat_dim=16, vocab_size=64,
                        max_clips=2, max_frames=6, max_sentences=2,
                        max_words=6),
        model=ModelConfig(embed_size=24, word_dim=12, feat_dim=16,
                          rnn_hidden=24, hierarchical=True),
        loss=LossConfig(),
        train=TrainConfig(num_epochs=epochs, lr=1e-3, lr_update=1,
                          val_step=0, log_step=100,
                          checkpoint_dir=str(tmp_path / "run")),
    )


def _ds(n, seed=0):
    return SyntheticHierarchicalDataset(num_videos=n, feat_dim=16,
                                        vocab_size=64, max_clips=2,
                                        max_frames=6, max_words=6, seed=seed)


def test_fit_log_step_zero_means_disabled(tmp_path):
    # 0 means "disabled" for val_step and snapshot_step; log_step must
    # follow the same convention, not divide by zero on the first group
    cfg = _cfg(tmp_path, epochs=1)
    cfg = cfg.replace(
        train=cfg.train.__class__(
            **{**cfg.train.__dict__, "log_step": 0}))
    state, _ = fit(cfg, _ds(16), None)
    assert int(state.step) == 2


def test_fit_skips_duplicate_end_of_epoch_validation(tmp_path, monkeypatch):
    """When the val_step boundary lands on the epoch's FINAL dispatch group,
    the end-of-epoch pass must not re-validate the identical params (it
    still writes the epoch+1 resume marker)."""
    import cmhse_tpu.train.loop as loop_mod

    calls = []
    real = loop_mod.validate_metrics

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(loop_mod, "validate_metrics", counting)
    # 16 train examples / batch 8 = 2 steps per epoch; val_step=2 fires on
    # the final group of every epoch
    cfg = _cfg(tmp_path, epochs=2)
    cfg = cfg.replace(
        train=cfg.train.__class__(
            **{**cfg.train.__dict__, "val_step": 2}))
    state, best = fit(cfg, _ds(16), _ds(8, seed=1))
    assert len(calls) == 2  # one per epoch, not two
    assert np.isfinite(best)
    # the epoch marker still advanced for resume
    b0 = next(iter(batches_from_dataset(_ds(16), cfg.data, shuffle=False)))
    mgr = CheckpointManager(cfg.train.checkpoint_dir, cfg)
    _, epoch, _, _ = mgr.restore(
        create_train_state(cfg, jax.random.PRNGKey(0), b0))
    mgr.close()
    assert epoch == 2


def test_validate_nan_rsum_never_poisons_best(tmp_path, monkeypatch):
    """A diverged validation (NaN rsum) must leave best_rsum and the best/
    checkpoint untouched: max(NaN, x) is NaN in Python and would otherwise
    disable best-tracking for the rest of the run."""
    import cmhse_tpu.train.loop as loop_mod

    seq = iter([float("nan"), 100.0, 50.0])

    def fake_metrics(*a, **kw):
        r = next(seq)
        return {"rsum": r, "v2p_r1": 0.0, "p2v_r1": 0.0}

    monkeypatch.setattr(loop_mod, "validate_metrics", fake_metrics)
    monkeypatch.setattr(loop_mod, "format_table", lambda m: str(m))
    cfg = _cfg(tmp_path, epochs=3)
    state, best = fit(cfg, _ds(16), _ds(8, seed=1))
    assert best == 100.0  # NaN neither became best nor erased the real one


def test_fit_rejects_indivisible_batch_early(tmp_path):
    # batch_size 6 cannot shard over the 8-device data mesh; fit() must say
    # so up front (with the fix spelled out), not as an opaque pjit error
    # from the first place_batch deep inside the epoch loop
    import dataclasses

    cfg = _cfg(tmp_path)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=6))
    with pytest.raises(ValueError, match="divisible by the data-mesh size"):
        fit(cfg, _ds(12))


def test_fit_validates_checkpoints_and_resumes(tmp_path):
    cfg = _cfg(tmp_path, epochs=2)
    state, best = fit(cfg, _ds(16), _ds(8, seed=1))
    assert np.isfinite(best)
    assert int(state.step) == 4  # 2 epochs x 2 batches
    assert os.path.exists(os.path.join(cfg.train.checkpoint_dir, "config.json"))
    assert os.path.exists(os.path.join(cfg.train.checkpoint_dir, "best"))
    assert os.path.exists(os.path.join(cfg.train.checkpoint_dir, "log.jsonl"))

    # resume for 1 more epoch from the same dir
    cfg2 = cfg.replace(
        train=cfg.train.__class__(
            **{**cfg.train.__dict__, "num_epochs": 3,
               "resume": cfg.train.checkpoint_dir},
        )
    )
    state2, _ = fit(cfg2, _ds(16), _ds(8, seed=1))
    assert int(state2.step) == 6

    # eval-path restore rebuilds model+params from config.json + best/
    model, params, cfg_restored = restore_for_eval(cfg.train.checkpoint_dir)
    assert cfg_restored.model.embed_size == 24
    batches = batches_from_dataset(_ds(8, seed=1), cfg.data, shuffle=False)
    m = validate_metrics(model, params, batches, ks=(1, 5))
    assert np.isfinite(m["rsum"])
    table = format_table(m, ks=(1, 5))
    assert "Video to Paragraph" in table and "MedR" in table

    # pointing at <run>/best (a natural mistake — it looks like a checkpoint
    # dir) must resolve to the run dir, not die on a missing config.json
    model_b, params_b, cfg_b = restore_for_eval(
        os.path.join(cfg.train.checkpoint_dir, "best"))
    assert cfg_b.model.embed_size == 24
    chex.assert_trees_all_equal(params_b, params)


def test_fit_applies_word2vec_init(tmp_path):
    """SURVEY C5 [B:7]: the reference's word2vec-initialized training recipe
    must be reachable end-to-end — fit() overwrites the embedding table rows
    for vocabulary words present in the vectors file and logs the hit count."""
    import json

    from cmhse_tpu.data.vocab import Vocabulary

    vocab = Vocabulary()
    for w in ("dog", "runs", "fast", "cat"):
        vocab.add_word(w)
    # vocab_size in cfg must cover len(vocab); ids: pad=0..unk=3, dog=4..cat=7
    word_dim = 12
    vecs_path = str(tmp_path / "vectors.npz")
    rng = np.random.RandomState(0)
    known = {"dog": rng.randn(word_dim).astype(np.float32),
             "fast": rng.randn(word_dim).astype(np.float32)}
    np.savez(vecs_path, words=np.array(list(known)),
             vectors=np.stack(list(known.values())))

    cfg = _cfg(tmp_path, epochs=1)
    cfg = cfg.replace(data=cfg.data.__class__(
        **{**cfg.data.__dict__, "word2vec_path": vecs_path}))

    with pytest.raises(ValueError, match="vocab"):
        fit(cfg, _ds(8), None)  # word2vec_path set but no vocab passed

    state, _ = fit(cfg, _ds(8), None, vocab=vocab)
    table = np.asarray(state.params["word_embedding"]["embedding"])
    # pretrained rows were installed before training; one Adam epoch moves
    # them only slightly, so match loosely but far tighter than random init
    for w, v in known.items():
        assert np.abs(table[vocab(w)] - v).max() < 0.05
    # a word without a vector keeps a random (+-0.1 uniform) row
    assert np.abs(table[vocab("runs")]).max() < 0.2
    events = [json.loads(l) for l in
              open(os.path.join(cfg.train.checkpoint_dir, "log.jsonl"))]
    w2v = [e for e in events if e.get("event") == "word2vec_init"]
    assert w2v and w2v[0]["hits"] == 2


def test_adjust_learning_rate_policy(tmp_path):
    cfg = _cfg(tmp_path)
    base = cfg.train.lr
    assert adjust_learning_rate(cfg, 0) == base
    cfg15 = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "lr_update": 15}))
    assert adjust_learning_rate(cfg15, 14) == base
    np.testing.assert_allclose(adjust_learning_rate(cfg15, 15), base * 0.1)
    np.testing.assert_allclose(adjust_learning_rate(cfg15, 30), base * 0.01)


def test_checkpoint_manager_roundtrip(tmp_path):
    cfg = _cfg(tmp_path)
    batches = list(batches_from_dataset(_ds(8), cfg.data, shuffle=False))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
    mgr = CheckpointManager(str(tmp_path / "ck"), cfg)
    mgr.save(state, epoch=3, best_rsum=42.5, is_best=True)

    state2 = create_train_state(cfg, jax.random.PRNGKey(1), batches[0])
    restored, epoch, best_rsum, groups_done = mgr.restore(state2)
    assert epoch == 3 and best_rsum == 42.5 and groups_done == 0
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_steps_per_dispatch_matches_single_step(tmp_path):
    """steps_per_dispatch>1 (train_steps: lax.scan inside one dispatch) must
    reproduce the 1-step-per-dispatch run exactly — same batches in the
    same order, identical math."""
    import dataclasses

    # 24 videos / batch 8 = 3 steps/epoch: spd=2 exercises both the full
    # [2]-group and the short [1]-remainder-group programs
    cfg1 = _cfg(tmp_path / "a", epochs=2)
    state1, _ = fit(cfg1, _ds(24), None)

    cfg2 = _cfg(tmp_path / "b", epochs=2)
    cfg2 = dataclasses.replace(
        cfg2, train=dataclasses.replace(cfg2.train, steps_per_dispatch=2,
                                        checkpoint_dir=str(tmp_path / "b"))
    )
    state2, _ = fit(cfg2, _ds(24), None)

    assert int(state1.step) == int(state2.step) > 0
    for p1, p2 in zip(jax.tree.leaves(state1.params),
                      jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(p1, np.float32),
                                   np.asarray(p2, np.float32),
                                   rtol=1e-6, atol=1e-7)


def test_steps_per_dispatch_bucketed_falls_back(tmp_path, capsys):
    """Bucketed batches have varying shapes, so spd>1 must fall back to
    1-step dispatch with a loud warning — and still train."""
    import dataclasses

    cfg = _cfg(tmp_path, epochs=1)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, fixed_shape=False,
                                 group_by_length=True),
        train=dataclasses.replace(cfg.train, steps_per_dispatch=4),
    )
    state, _ = fit(cfg, _ds(16), None)
    assert int(state.step) > 0
    assert "requires fixed_shape" in capsys.readouterr().out


def test_fit_rejects_oversized_vocab_early(tmp_path):
    """len(vocab) > vocab_size used to train silently wrong: out-of-table
    ids are CLAMPED by jnp.take and their gradients dropped by the
    segment-sum backward (review r5). fit() must fail up front with the
    fix spelled out."""
    from cmhse_tpu.data.vocab import Vocabulary

    vocab = Vocabulary()
    for i in range(70):  # 4 specials + 70 words > vocab_size=64
        vocab.add_word(f"w{i}")
    cfg = _cfg(tmp_path)
    with pytest.raises(ValueError, match="vocab_size"):
        fit(cfg, _ds(16), vocab=vocab)


def test_restore_for_eval_latest_ckpt_cross_topology(tmp_path, monkeypatch):
    """The latest-ckpt path (a run killed before any best/ was written)
    needs the SAME cross-topology numpy-template fallback the best/ branch
    has, and must close its orbax manager (review r5)."""
    import shutil

    import orbax.checkpoint as ocp

    cfg = _cfg(tmp_path, epochs=1)
    fit(cfg, _ds(16), _ds(8, seed=1))
    shutil.rmtree(os.path.join(cfg.train.checkpoint_dir, "best"))

    # plain latest-ckpt restore works (and the manager is closed)
    model, params, _ = restore_for_eval(cfg.train.checkpoint_dir)

    # simulate the cross-topology ValueError the no-template restore raises
    # when the saved per-device sharding names missing device ids
    real_restore = ocp.CheckpointManager.restore

    def fake_restore(self, step, *a, **kw):
        if not a and not kw:
            raise ValueError("simulated: Device TPU_7 was not found")
        return real_restore(self, step, *a, **kw)

    monkeypatch.setattr(ocp.CheckpointManager, "restore", fake_restore)
    model2, params2, _ = restore_for_eval(cfg.train.checkpoint_dir)
    chex.assert_trees_all_equal(params2, params)
