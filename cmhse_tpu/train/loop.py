"""Training loop (rebuilds SURVEY.md C10: the reference ``train.py`` main/
train/validate trio — epoch loop, per-step logging, lr decay /10 every
``lr_update`` epochs, periodic validation by rsum, best-checkpoint save,
resume).

TPU-first: one jitted ``train_step`` shared across 1..N chips (data-parallel
mesh); batches stream host->device while the previous step runs (dispatch is
async; we only block on the metrics we print).
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from cmhse_tpu.config import ExperimentConfig
from cmhse_tpu.data.loader import batches_from_dataset
from cmhse_tpu.eval.retrieval import format_table, validate_metrics
from cmhse_tpu.models import CMHSE
from cmhse_tpu.parallel.mesh import make_mesh
from cmhse_tpu.parallel.train_dp import place_batch, place_state
from cmhse_tpu.train.checkpoint import CheckpointManager
from cmhse_tpu.train.state import (create_train_state, set_learning_rate,
                                   train_step, train_steps)
from cmhse_tpu.utils.logging import JsonlLogger, LogCollector


def adjust_learning_rate(cfg: ExperimentConfig, epoch: int) -> float:
    """Reference policy: lr * decay^(epoch // lr_update)."""
    t = cfg.train
    return t.lr * (t.lr_decay ** (epoch // max(t.lr_update, 1)))


def _batched(iterable, n: int):
    """``itertools.batched`` (3.12+) with a 3.10/3.11 fallback — pyproject
    declares requires-python >= 3.10 (ADVICE.md round 2)."""
    try:
        from itertools import batched
        return batched(iterable, n)
    except ImportError:
        from itertools import islice

        def gen():
            it = iter(iterable)
            while chunk := tuple(islice(it, n)):
                yield chunk

        return gen()


def _grouped_host_batches(group_tuples, spd: int):
    """Turn grouped HOST batches (tuples from ``_batched``) into
    ``(n_steps, n_pairs, host_batch)`` where for ``spd > 1`` the batch is
    np.stack-ed to ``[K, B, ...]`` (the epoch's final group may be short —
    one extra ``[r < K]`` program, compiled once per run). Stacking and the
    valid-pair count both happen host-side, BEFORE placement — a
    multi-host global batch spans non-addressable devices and cannot be
    fetched back. Takes the ALREADY-grouped iterator so a mid-epoch resume
    can skip consumed groups upstream without paying for the stack copies."""
    for group in group_tuples:
        n_pairs = int(sum(int(np.asarray(b.valid).sum()) for b in group))
        if spd == 1:
            yield 1, n_pairs, group[0]
        else:
            yield (len(group), n_pairs,
                   jax.tree.map(lambda *xs: np.stack(xs), *group))


def _prefetch(group_iter, mesh, spd: int, lookahead: int = 2):
    """Double-buffered host->device pipeline: device_put is async, so pushing
    the next group while the current step runs hides the transfer (the
    reference relied on DataLoader worker processes for the same overlap)."""
    from collections import deque

    batch_dim = 1 if spd > 1 else 0
    buf = deque()
    for n_steps, n_pairs, host in group_iter:
        placed = (place_batch(host, mesh, batch_dim=batch_dim)
                  if mesh is not None else host)
        buf.append((n_steps, n_pairs, placed))
        if len(buf) >= lookahead:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def fit(
    cfg: ExperimentConfig,
    train_dataset,
    val_dataset=None,
    use_mesh: bool = True,
    vocab=None,
) -> tuple:
    """Full training run; returns (state, best_rsum).

    ``use_mesh``: build a data mesh over all visible devices (size 1 is fine
    — the same code path runs single-chip).
    ``vocab``: the :class:`Vocabulary` the dataset was tokenized with;
    required when ``cfg.data.word2vec_path`` is set (the reference
    initializes its embedding table from word2vec, SURVEY.md C5 [B:7]).
    """
    mesh = (
        make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
        if use_mesh else None
    )
    if mesh is not None:
        dp = mesh.shape.get("data", 1)
        if cfg.data.batch_size % dp:
            # fail HERE with the fix spelled out — otherwise this surfaces
            # as an opaque pjit divisibility error from inside place_batch
            raise ValueError(
                f"batch_size ({cfg.data.batch_size}) must be divisible by "
                f"the data-mesh size ({dp} devices); pass a multiple of "
                f"{dp}, or shrink TrainConfig.mesh_shape"
            )
    if mesh is None and jax.process_count() > 1:
        raise ValueError(
            "fit(use_mesh=False) is single-process only: multi-host batch "
            "placement and validation both need the global mesh"
        )
    if vocab is not None and len(vocab) > cfg.data.vocab_size:
        # fail LOUD: ids past the table are silently CLAMPED by jnp.take in
        # the forward pass and their gradients dropped by the segment-sum
        # backward (num_segments=vocab_size) — training would "work" with
        # wrong text embeddings and no error anywhere (review r5)
        raise ValueError(
            f"vocabulary has {len(vocab)} entries but "
            f"cfg.data.vocab_size={cfg.data.vocab_size}; pass "
            f"--vocab_size >= {len(vocab)} (the reference sizes the "
            f"embedding table from the built vocabulary)"
        )
    # multi-host: log.jsonl lives on shared storage next to the checkpoints
    # — one writer suffices (same policy as checkpoint.py's config.json
    # guard); other processes get a no-op logger instead of racing appends
    logger = JsonlLogger(os.path.join(cfg.train.checkpoint_dir, "log.jsonl"),
                         enabled=jax.process_index() == 0)
    ckpt = CheckpointManager(cfg.train.checkpoint_dir, cfg)
    model = CMHSE(cfg=cfg.model, vocab_size=cfg.data.vocab_size)

    # init sample always uses the maximal (fixed) shapes so parameter init is
    # independent of the bucketing mode
    sample = next(iter(batches_from_dataset(train_dataset, cfg.data,
                                            shuffle=False,
                                            fixed_shape=True)))
    rng = jax.random.PRNGKey(cfg.train.seed)
    state = create_train_state(cfg, rng, sample, model=model)

    if cfg.data.word2vec_path:
        # reference recipe: overwrite the random embedding table with
        # pretrained vectors BEFORE training; a resume below still wins
        # (restored params replace these, as in the reference)
        if vocab is None:
            raise ValueError(
                "cfg.data.word2vec_path is set but fit() got no vocab; pass "
                "the Vocabulary the dataset was tokenized with"
            )
        from cmhse_tpu.data.word_vectors import apply_pretrained_embeddings

        params, hits = apply_pretrained_embeddings(
            dict(state.params), vocab, cfg.data.word2vec_path
        )
        state = state.replace(params=params)
        print(f"word2vec init: {hits}/{len(vocab)} vocabulary rows "
              f"loaded from {cfg.data.word2vec_path}")
        logger.log("word2vec_init", hits=hits, vocab_size=len(vocab),
                   path=cfg.data.word2vec_path)

    start_epoch, best_rsum, start_groups = 0, -np.inf, 0
    if cfg.train.resume:
        # checkpoint.py's own path normalization decides "same dir -> reuse
        # the open manager"; using anything else here re-opens the
        # double-manager resume bug the check exists to prevent
        from cmhse_tpu.train.checkpoint import _abs
        resume_mgr = (
            ckpt if _abs(cfg.train.resume) == _abs(cfg.train.checkpoint_dir)
            else CheckpointManager(cfg.train.resume)
        )
        try:
            state, start_epoch, best_rsum, start_groups = \
                resume_mgr.restore(state)
        finally:
            if resume_mgr is not ckpt:
                resume_mgr.close()  # join its orbax thread; ckpt lives on
        pos = f" (+{start_groups} dispatch groups)" if start_groups else ""
        print(f"resumed from {cfg.train.resume} at epoch {start_epoch}{pos}, "
              f"best_rsum {best_rsum:.2f}")

    if mesh is not None:
        state = place_state(state, mesh)

    # steps_per_dispatch > 1: scan several updates inside one jit dispatch
    # (train_steps) to amortize host->device dispatch latency; needs
    # identical batch shapes, so it requires the fixed-shape loader mode.
    # Log/val cadence rounds to dispatch boundaries.
    spd = max(1, cfg.train.steps_per_dispatch)
    if spd > 1 and not cfg.data.fixed_shape:
        print("steps_per_dispatch > 1 requires fixed_shape batches; "
              "running 1 step per dispatch")
        spd = 1

    # Graceful preemption (snapshot mode only): Cloud TPU / GKE deliver
    # SIGTERM ahead of eviction. Catch it, finish the in-flight group, write
    # a mid-epoch snapshot, and return cleanly — the next run with --resume
    # continues at the exact batch training stopped.
    preempt = {"flag": False}
    prev_sigterm = None
    if cfg.train.snapshot_step > 0:
        import signal

        def _on_sigterm(signum, frame):
            preempt["flag"] = True
            print("SIGTERM received: snapshotting after the in-flight "
                  "dispatch group, then exiting")

        try:
            prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            prev_sigterm = None  # not the main thread; preemption unhandled

    try:
        return _fit_epochs(cfg, train_dataset, val_dataset, mesh, model,
                           state, ckpt, logger, start_epoch, best_rsum,
                           start_groups, spd, preempt)
    finally:
        ckpt.close()  # waits out orbax's background thread (one per manager)
        if prev_sigterm is not None:
            import signal

            signal.signal(signal.SIGTERM, prev_sigterm)


def _fit_epochs(cfg, train_dataset, val_dataset, mesh, model, state, ckpt,
                logger, start_epoch, best_rsum, start_groups, spd, preempt):
    global_step = int(state.step)
    for epoch in range(start_epoch, cfg.train.num_epochs):
        lr = adjust_learning_rate(cfg, epoch)
        state = set_learning_rate(state, lr)
        collector = LogCollector()
        t_epoch = time.time()
        n_pairs = 0

        batch_iter = batches_from_dataset(
            train_dataset, cfg.data, shuffle=True,
            seed=cfg.data.shuffle_seed + epoch,
            fixed_shape=cfg.data.fixed_shape,
            group_by_length=cfg.data.group_by_length,
            # multi-host: each process loads + feeds only its slice of every
            # global batch; place_batch assembles the global sharded array
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        group_tuples = _batched(batch_iter, spd)
        groups_done = 0
        if epoch == start_epoch and start_groups > 0:
            # mid-epoch resume (snapshot_step): the per-epoch shuffle is
            # seeded, so the group stream reproduces — drop the groups the
            # snapshot already consumed. Skipping happens on the raw group
            # TUPLES, before _grouped_host_batches, so the [K, B, ...]
            # stack copies and valid-sums are never paid for skipped work
            # (the loader's per-batch padding is; it has no skip path)
            from itertools import islice

            skipped = sum(1 for _ in islice(group_tuples, start_groups))
            if skipped < start_groups:
                print(f"warning: snapshot recorded {start_groups} consumed "
                      f"groups but epoch {epoch} only has {skipped}; the "
                      f"dataset or batching config changed since the save")
            groups_done = skipped
            print(f"mid-epoch resume: skipped {skipped} already-trained "
                  f"dispatch groups of epoch {epoch}")
            logger.log("resume_mid_epoch", epoch=epoch, groups=skipped)
        groups = _grouped_host_batches(group_tuples, spd)
        last_val_step = -1  # skip the end-of-epoch re-validation when the
        # val_step boundary already validated on the final dispatch group
        for n_steps, group_pairs, batch in _prefetch(groups, mesh, spd):
            if spd > 1:
                state, metrics = train_steps(state, batch, cfg.loss)
            else:
                state, metrics = train_step(state, batch, cfg.loss)
            n_pairs += group_pairs
            groups_done += 1
            prev_step, global_step = global_step, global_step + n_steps

            if (cfg.train.log_step > 0  # 0 = disabled, like val/snapshot
                    and global_step // cfg.train.log_step
                    > prev_step // cfg.train.log_step):
                means = {k: float(np.mean(np.asarray(v)))
                         for k, v in metrics.items()}
                for k, v in means.items():
                    collector.update(k, v)
                print(f"epoch {epoch} step {global_step} lr {lr:.2e} "
                      f"{collector}")
                logger.log("train_step", epoch=epoch, step=global_step,
                           lr=lr, **means)

            if (
                val_dataset is not None
                and cfg.train.val_step > 0
                and global_step // cfg.train.val_step
                > prev_step // cfg.train.val_step
            ):
                best_rsum = _validate_and_save(
                    cfg, model, state, val_dataset, mesh, ckpt, logger,
                    epoch, best_rsum, groups_done=groups_done,
                )
                last_val_step = global_step

            if (
                cfg.train.snapshot_step > 0
                and global_step // cfg.train.snapshot_step
                > prev_step // cfg.train.snapshot_step
            ):
                # preemption point: records the group offset so a resume
                # continues THIS epoch exactly where the stream stopped
                ckpt.save(state, epoch=epoch, best_rsum=float(best_rsum),
                          groups_done=groups_done)
                logger.log("snapshot", epoch=epoch, step=global_step,
                           groups_done=groups_done)

            if preempt["flag"]:
                ckpt.save(state, epoch=epoch, best_rsum=float(best_rsum),
                          groups_done=groups_done)
                logger.log("preempt_exit", epoch=epoch, step=global_step,
                           groups_done=groups_done)
                print(f"preemption snapshot written at step {global_step} "
                      f"(epoch {epoch}, {groups_done} groups); exiting")
                logger.close()
                return state, best_rsum

        # fence outstanding device work before timing: train_step dispatch is
        # async, so without this up to log_step-1 in-flight steps would count
        # as completed and overstate throughput (ADVICE.md round 1)
        jax.block_until_ready(state.params)
        dt = time.time() - t_epoch
        logger.log("epoch_end", epoch=epoch, seconds=dt,
                   pairs_per_sec=n_pairs / max(dt, 1e-9))

        # end-of-epoch validation + checkpoint; epoch+1 = next epoch to run
        # on resume (reference saves {'epoch': epoch + 1, ...}). When the
        # val_step boundary already validated these exact params on the
        # final group, only the epoch marker is (re)saved — a second full
        # validation pass would be pure wasted wall-clock.
        if val_dataset is not None and global_step != last_val_step:
            best_rsum = _validate_and_save(
                cfg, model, state, val_dataset, mesh, ckpt, logger,
                epoch + 1, best_rsum,
            )
        else:
            ckpt.save(state, epoch=epoch + 1, best_rsum=float(best_rsum))

    logger.close()
    return state, best_rsum


def _validate_and_save(cfg, model, state, val_dataset, mesh, ckpt, logger,
                       epoch, best_rsum, groups_done=0):
    # multi-host: each process loads only its slice of every val batch;
    # validate_metrics' mesh path assembles the global arrays (a host-side
    # full iteration per process would feed non-addressable global jits)
    batches = batches_from_dataset(
        val_dataset, cfg.data, shuffle=False,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    metrics = validate_metrics(model, state.params, batches, ks=(1, 5, 10, 50),
                               mesh=mesh)
    print(format_table(metrics))
    logger.log("validate", epoch=epoch, step=int(state.step), **metrics)
    rsum = float(metrics["rsum"])
    if not np.isfinite(rsum):
        # diverged validation: Python max(NaN, x) returns NaN, which would
        # poison best_rsum forever (every later 'rsum > NaN' is False, then
        # max() RESETS the best to whatever follows) — keep the tracked
        # best and the best/ dir untouched instead
        print(f"warning: non-finite validation rsum ({rsum}); best "
              "checkpoint left unchanged")
        ckpt.save(state, epoch=epoch, best_rsum=float(best_rsum),
                  is_best=False, groups_done=groups_done)
        return best_rsum
    is_best = rsum > best_rsum
    ckpt.save(state, epoch=epoch, best_rsum=float(max(rsum, best_rsum)),
              is_best=is_best, groups_done=groups_done)
    return max(rsum, best_rsum)
