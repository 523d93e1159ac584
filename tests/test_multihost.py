"""Multi-host data-path correctness (SURVEY.md section 2c), tested
single-process: the loader's per-process slicing math and the
process-local -> global sharded-array assembly.

A real v5e pod slice with >1 host can't exist in this image, so the tests
pin the two invariants multi-host training relies on:
  1. concatenating every process's local batches in process order
     reproduces the single-process batches exactly (row-major layout that
     ``place_batch_global`` assumes);
  2. ``place_batch_global`` builds arrays with the same content and
     sharding that the single-process ``device_put`` path produces.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmhse_tpu.config import DataConfig
from cmhse_tpu.data import SyntheticHierarchicalDataset, batches_from_dataset
from cmhse_tpu.parallel.mesh import make_mesh
from cmhse_tpu.parallel.train_dp import place_batch, place_batch_global

CFG = DataConfig(batch_size=8, feat_dim=8, vocab_size=32, max_clips=2,
                 max_frames=4, max_sentences=2, max_words=4)


def _ds(n):
    return SyntheticHierarchicalDataset(num_videos=n, feat_dim=8,
                                        vocab_size=32, max_clips=2,
                                        max_frames=4, max_words=4, seed=3)


@pytest.mark.parametrize("n_videos", [32, 30])  # 30: ragged final batch
def test_process_slices_reassemble_to_global_batches(n_videos):
    pc = 4
    ds = _ds(n_videos)
    global_batches = list(batches_from_dataset(ds, CFG, shuffle=True, seed=7))
    per_proc = [
        list(batches_from_dataset(ds, CFG, shuffle=True, seed=7,
                                  process_index=pi, process_count=pc))
        for pi in range(pc)
    ]
    assert all(len(b) == len(global_batches) for b in per_proc)
    for bi, gb in enumerate(global_batches):
        locals_ = [per_proc[pi][bi] for pi in range(pc)]
        assert all(lb.frames.shape[0] == CFG.batch_size // pc
                   for lb in locals_)
        for field in ("frames", "frame_len", "clip_len", "words", "word_len",
                      "sent_len", "video_ids", "valid"):
            got = np.concatenate(
                [np.asarray(getattr(lb, field)) for lb in locals_]
            )
            np.testing.assert_array_equal(
                got, np.asarray(getattr(gb, field)),
                err_msg=f"batch {bi} field {field}",
            )


def test_process_count_must_divide_batch():
    with pytest.raises(ValueError, match="divide"):
        next(iter(batches_from_dataset(_ds(16), CFG, process_index=0,
                                       process_count=3)))


def test_bucketed_multihost_rejected():
    with pytest.raises(ValueError, match="multi-host"):
        next(iter(batches_from_dataset(_ds(16), CFG, fixed_shape=False,
                                       process_index=0, process_count=2)))


def test_maybe_initialize_distributed_gating(monkeypatch):
    """ADVICE r2: single-host TPU VMs also set TPU_WORKER_ID=0 and a
    one-entry hostnames list — initialize() must fire only on an actual
    multi-worker signal, and never twice."""
    from cmhse_tpu.parallel import mesh as mesh_mod

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_ID"):
        monkeypatch.delenv(var, raising=False)

    mesh_mod.maybe_initialize_distributed()
    assert calls == []  # no markers at all

    monkeypatch.setenv("TPU_WORKER_ID", "0")
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0")
    mesh_mod.maybe_initialize_distributed()
    assert calls == []  # single-host TPU VM markers: still a no-op

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    mesh_mod.maybe_initialize_distributed()
    assert calls == [1]  # real pod: initialize once

    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    mesh_mod.maybe_initialize_distributed()
    assert calls == [1]  # already initialized: idempotent


class _RecordingCheckpointer:
    def __init__(self, log):
        self.log = log

    def save(self, path, payload):
        self.log.append(("save", path))

    def wait_until_finished(self):
        self.log.append(("wait",))


@pytest.mark.parametrize("proc_index,expect_rmtree", [(0, True), (1, False)])
def test_write_best_dir_multihost_guard(tmp_path, monkeypatch, proc_index,
                                        expect_rmtree):
    """VERDICT r2 missing 5: on a faked 2-process pod, only process 0 may
    delete the shared best/ dir, every process participates in the orbax
    save (a collective), and barriers bracket the delete so no host can
    save into a dir another host is still removing."""
    from cmhse_tpu.train import checkpoint as ckpt_mod

    best = tmp_path / "best"
    best.mkdir()
    sentinel = best / "old_payload"
    sentinel.write_text("previous best")

    log = []
    monkeypatch.setattr(ckpt_mod, "_process_index", lambda: proc_index)
    monkeypatch.setattr(ckpt_mod, "_process_count", lambda: 2)
    monkeypatch.setattr(ckpt_mod, "_sync_processes",
                        lambda tag: log.append(("sync", tag)))
    ckpt_mod.write_best_dir(str(tmp_path), {"params": {}},
                           checkpointer=_RecordingCheckpointer(log))

    assert sentinel.exists() is (not expect_rmtree)
    kinds = [e[0] for e in log]
    # order: barrier, (rmtree on proc 0), barrier, save, wait
    assert kinds == ["sync", "sync", "save", "wait"]
    assert log[2][1] == str(best)


def test_write_best_dir_single_process(tmp_path):
    """Single-process (the common case) runs the REAL _sync_processes no-op
    path: the stale dir is replaced and the save happens."""
    from cmhse_tpu.train import checkpoint as ckpt_mod

    best = tmp_path / "best"
    best.mkdir()
    (best / "stale").write_text("x")
    log = []
    ckpt_mod.write_best_dir(str(tmp_path), {"params": {}},
                           checkpointer=_RecordingCheckpointer(log))
    assert not (best / "stale").exists()
    assert [e[0] for e in log] == ["save", "wait"]


def test_place_batch_global_matches_device_put():
    mesh = make_mesh((-1,), ("data",))
    batch = next(iter(batches_from_dataset(_ds(16), CFG, shuffle=False)))
    via_put = place_batch(batch, mesh)  # single-process branch
    via_global = place_batch_global(batch, mesh, process_count=1)
    for leaf_put, leaf_glob in zip(jax.tree.leaves(via_put),
                                   jax.tree.leaves(via_global)):
        assert leaf_glob.sharding == leaf_put.sharding
        np.testing.assert_array_equal(np.asarray(leaf_glob),
                                      np.asarray(leaf_put))
    # the assembled batch feeds the jitted step exactly like device_put does
    s = jnp.sum(via_global.frames) + jnp.sum(via_global.word_len)
    assert np.isfinite(float(s))


def test_place_batch_global_stacked_dim1():
    """Stacked multi-step groups ([K, B, ...], train_steps) shard on dim 1:
    the global assembly must scale dim 1 by process_count and match the
    single-process device_put placement."""
    mesh = make_mesh((-1,), ("data",))
    it = iter(batches_from_dataset(_ds(16), CFG, shuffle=False))
    b0, b1 = next(it), next(it)
    stacked = jax.tree.map(lambda a, b: np.stack([a, b]), b0, b1)
    via_put = place_batch(stacked, mesh, batch_dim=1)
    via_global = place_batch_global(stacked, mesh, process_count=1,
                                    batch_dim=1)
    for leaf_put, leaf_glob in zip(jax.tree.leaves(via_put),
                                   jax.tree.leaves(via_global)):
        assert leaf_glob.sharding == leaf_put.sharding
        assert leaf_glob.shape == leaf_put.shape
        np.testing.assert_array_equal(np.asarray(leaf_glob),
                                      np.asarray(leaf_put))
    assert via_global.frames.shape[0] == 2  # K preserved, unsharded
