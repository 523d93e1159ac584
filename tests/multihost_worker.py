"""Subprocess worker for the REAL 2-process ``jax.distributed`` test
(SURVEY.md section 2c; VERDICT r3 missing 2).

Launched twice by ``test_multihost.py::test_two_process_distributed_fit``
— each process owns 4 virtual CPU devices of an 8-device global mesh and
runs the SAME ``fit()`` the single-process suite runs, so the whole
multi-host stack is exercised for real instead of via monkeypatched
process counts: ``jax.distributed.initialize``, per-process loader
slicing, ``place_batch_global``'s cross-process array assembly, gloo
collectives inside the jitted train/eval steps, multi-process orbax
checkpointing, the process-0 best-dir delete guard, and the process-0-only
JSONL logger.

Writes ``result_<pid>.json`` into the shared workdir for the parent test
to assert on. Usage:

    python multihost_worker.py <process_id> <coordinator> <workdir>

``<workdir>`` must contain ``cfg.json`` (ExperimentConfig.to_json) whose
``checkpoint_dir`` points inside the workdir.
"""

import json
import os
import sys


def main() -> None:
    pid, coord, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    # watchdog: a wedged cross-process collective or orbax barrier would
    # otherwise hang silently until the parent's 900 s wait expires with no
    # evidence. Dump every thread's stack to the worker log and die just
    # before that, so a hang fails WITH stacks. (The limit is total worker
    # runtime, not idle time — keep it under the parent timeout.)
    import faulthandler

    faulthandler.enable()
    faulthandler.dump_traceback_later(840, exit=True)

    # mirror tests/conftest.py: CPU platform forced over the sitecustomize's
    # axon plugin, 4 fake devices per process (8 global), highest matmul
    # precision. The persistent compile cache stays OFF here — on this
    # image, an executable DESERIALIZED from the cache loses its gloo
    # collectives wiring, so any cross-process program loaded from cache
    # hangs silently at its first collective. Measured in this very test:
    # run 1 (repo-shared cache) hung at the first validation's eager metric
    # ops; run 2 (per-run cache, cold) compiled validation 1 in memory and
    # PASSED it, then hung at validation 2 after reloading the entries
    # validation 1 had just written — same processes, same topology, so the
    # AOT load path itself is what breaks. Single-process runs (the rest of
    # the suite) are unaffected.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2 and jax.process_index() == pid
    assert jax.local_device_count() == 4 and jax.device_count() == 8

    # spy on shutil.rmtree: write_best_dir's process-0 guard is the thing
    # monkeypatched unit tests could never pin — under REAL multi-process
    # orbax, only process 0 may delete the previous best/ (checkpoint.py)
    import shutil

    rmtree_paths: list[str] = []
    real_rmtree = shutil.rmtree

    def _spy_rmtree(path, *a, **kw):
        rmtree_paths.append(str(path))
        return real_rmtree(path, *a, **kw)

    shutil.rmtree = _spy_rmtree

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cmhse_tpu.config import ExperimentConfig
    from cmhse_tpu.data import (SyntheticHierarchicalDataset,
                                batches_from_dataset)
    from cmhse_tpu.parallel.mesh import make_mesh
    from cmhse_tpu.parallel.train_dp import place_batch
    from cmhse_tpu.train.loop import fit

    with open(os.path.join(workdir, "cfg.json")) as f:
        cfg = ExperimentConfig.from_json(f.read())

    def _ds(n, seed):
        return SyntheticHierarchicalDataset(
            num_videos=n, feat_dim=cfg.data.feat_dim,
            vocab_size=cfg.data.vocab_size, max_clips=cfg.data.max_clips,
            max_frames=cfg.data.max_frames, max_words=cfg.data.max_words,
            seed=seed)

    train, val = _ds(16, seed=0), _ds(8, seed=1)

    # probe: the global batch place_batch assembles from THIS process's
    # loader slice must equal the batch a single-process loader yields —
    # row for row (any overlap/misorder between the two processes' slices
    # shifts some row's sum). Run through the public multi-process entry
    # (place_batch routes to place_batch_global when process_count > 1).
    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
    local = next(iter(batches_from_dataset(
        train, cfg.data, shuffle=True, seed=cfg.data.shuffle_seed,
        process_index=pid, process_count=2)))
    gbatch = place_batch(local, mesh)
    row_sums = np.asarray(jax.jit(
        lambda x: jnp.sum(x.reshape(x.shape[0], -1), axis=1),
        out_shardings=NamedSharding(mesh, P()))(gbatch.frames))
    want = next(iter(batches_from_dataset(
        train, cfg.data, shuffle=True, seed=cfg.data.shuffle_seed)))
    want_sums = np.asarray(want.frames).reshape(row_sums.shape[0], -1).sum(1)
    rows_ok = bool(np.allclose(row_sums, want_sums, rtol=1e-5, atol=1e-5))

    state, best_rsum = fit(cfg, train, val)

    # Deterministically exercise the best-REPLACE path: fit() is only
    # guaranteed to write best/ ONCE on this tiny synthetic run (the first
    # validation), so rewrite it through the same write_best_dir used by
    # _validate_and_save — under REAL multi-process orbax the existing
    # best/ must be rmtree'd by process 0 ONLY, fenced by barriers on both
    # sides (the behavior monkeypatched process counts can never pin). The
    # payload re-saves the CURRENT best params, so the parent's
    # restore-and-compare against the single-process run still holds.
    from cmhse_tpu.train.checkpoint import (eval_payload, restore_for_eval,
                                            write_best_dir)

    _, best_params, _ = restore_for_eval(cfg.train.checkpoint_dir)
    write_best_dir(cfg.train.checkpoint_dir,
                   eval_payload(best_params, step=int(state.step),
                                best_rsum=float(best_rsum)))

    # params come back replicated, hence fully addressable on every process
    leaves = jax.tree.leaves(state.params)
    checksum = float(np.sum([np.abs(np.asarray(l)).sum() for l in leaves]))

    with open(os.path.join(workdir, f"result_{pid}.json"), "w") as f:
        json.dump({
            "process": pid,
            "rows_ok": rows_ok,
            "best_rsum": float(best_rsum),
            "param_checksum": checksum,
            "final_step": int(state.step),
            "rmtree_best": [p for p in rmtree_paths
                            if os.path.basename(p.rstrip("/")) == "best"],
        }, f)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
