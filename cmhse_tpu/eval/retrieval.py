"""Offline retrieval evaluation (rebuilds SURVEY.md C12 + section 3.2: the
reference's ``evaluation.py`` ``evalrank()`` entry — encode the whole split,
score, print the R@k table both directions).

The similarity matrix and ranking run on device (single chip via
``bidirectional_metrics``; sharded across a mesh via
``sharded_retrieval_metrics`` when one is given).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cmhse_tpu.ops.pallas_sim import pallas_rank_counts, should_stream
from cmhse_tpu.ops.ranking import bidirectional_metrics
from cmhse_tpu.ops.similarity import cosine_sim


def streaming_bidirectional_metrics(
    v_emb,
    p_emb,
    ks: tuple[int, ...] = (1, 5, 10, 50),
    valid=None,
    return_ranks: bool = False,
) -> dict:
    """Bidirectional R@k / MedR / MeanR via the streaming rank-count kernel:
    gallery tiles flow through VMEM and the ``[N, N]`` similarity matrix is
    never materialized in HBM (SURVEY.md section 2a, eval-side kernel).

    Rank semantics match :func:`cmhse_tpu.ops.ranking.bidirectional_metrics`
    (strict-greater counting, NaN positives rank worst). The positive score
    is the row-wise dot instead of the GEMM diagonal; both are the same
    reduction over D in float32.

    ``valid``: bool[N] row validity for device-resident galleries that keep
    padding rows in place; invalid rows are excluded as queries AND gallery.
    """
    from cmhse_tpu.ops.ranking import bidirectional_metrics_from_ranks

    pos_score = jnp.sum(
        v_emb.astype(jnp.float32) * p_emb.astype(jnp.float32), axis=1
    )
    if valid is not None:
        # invalid rows must not look like (possibly NaN) real queries
        pos_score = jnp.where(valid, pos_score, jnp.inf)

    def rank_fn(a, b):
        return pallas_rank_counts(
            a, b, pos_score, gallery_valid=valid,
            pos_idx=jnp.arange(a.shape[0], dtype=jnp.int32),
        )

    return bidirectional_metrics_from_ranks(rank_fn, v_emb, p_emb,
                                            ks=ks, valid=valid,
                                            return_ranks=return_ranks)


def validate_metrics(
    model,
    params,
    batches,
    ks: tuple[int, ...] = (1, 5, 10, 50),
    mesh=None,
    mode: str = "query",
    streaming: bool | None = None,
    return_ranks: bool = False,
) -> dict[str, float]:
    """Encode a split and compute bidirectional retrieval metrics.

    With ``mesh`` the gallery is sharded (BASELINE config 5); without, the
    single-device on-device path runs. ``streaming`` selects the Pallas
    rank-count kernel (no [Q, N] materialization); None = auto (on for
    TPU galleries >= STREAMING_GALLERY_MIN). Returns plain floats.

    ``return_ranks``: return ``(metrics, ranks)`` instead, where ``ranks``
    holds int numpy ``v2p_ranks`` / ``p2v_ranks`` COMPACTED to valid rows in
    dataset order — identical across the dense / streaming / sharded
    backends (pinned by tests) — for per-query error analysis.
    """
    if mesh is not None:
        # fully device-resident path: encode -> sharded rank counting ->
        # masked reductions; only the final scalars cross to the host.
        # Batches are placed batch-sharded over the mesh BEFORE encoding, so
        # (a) the encode itself runs data-parallel and (b) on a multi-host
        # pod each process may feed just its slice of every global batch
        # (loader process_index/process_count) — place_batch assembles the
        # global arrays; host batches would not be addressable globally.
        from cmhse_tpu.eval.encode import encode_gallery_device
        from cmhse_tpu.parallel.eval_sharded import sharded_retrieval_metrics
        from cmhse_tpu.parallel.train_dp import place_batch

        ndev = int(np.prod(list(mesh.shape.values())))
        # batch-dim sharding needs GLOBAL rows % ndev == 0; with per-process
        # local batches that means local rows % devices-per-process == 0
        pad_to = max(1, ndev // jax.process_count())

        def _placed():
            for b in batches:
                # pad with invalid rows (valid=False via zero padding) —
                # eval masks them out everywhere downstream
                rows = b.valid.shape[0]
                pad = (-rows) % pad_to
                if pad:
                    b = jax.tree.map(
                        lambda x: np.pad(
                            np.asarray(x),
                            ((0, pad),) + ((0, 0),) * (np.asarray(x).ndim - 1),
                        ),
                        b,
                    )
                yield place_batch(b, mesh)

        video_embs, para_embs, valid = encode_gallery_device(
            model, params, _placed()
        )
        metrics = sharded_retrieval_metrics(
            video_embs, para_embs, mesh, ks=ks, mode=mode, valid=valid,
            streaming=streaming, return_ranks=return_ranks,
        )
    else:
        if jax.process_count() > 1:
            raise ValueError(
                "validate_metrics(mesh=None) on a multi-process run would "
                "score each process's local slice as if it were the whole "
                "split; pass the global mesh"
            )
        if mode != "query":
            # mode selects HOW the sharded evaluator splits work across the
            # mesh; without a mesh there is nothing to select — say so
            # instead of silently running the default path
            print(f"validate_metrics: mode={mode!r} is a sharded-eval knob "
                  "and has no effect without a mesh (pass --sharded)")
        from cmhse_tpu.eval.encode import encode_gallery_device

        video_embs, para_embs, valid = encode_gallery_device(
            model, params, batches
        )
        if should_stream(video_embs.shape[0], streaming):
            metrics = streaming_bidirectional_metrics(
                video_embs, para_embs, ks=ks, valid=valid,
                return_ranks=return_ranks,
            )
        else:
            keep = jnp.asarray(valid)
            sims = cosine_sim(video_embs[keep], para_embs[keep])
            metrics = bidirectional_metrics(sims, ks=ks,
                                            return_ranks=return_ranks)
            valid = None  # ranks below are already valid-rows-only
    rank_keys = [k for k in metrics if k.endswith("_ranks")]
    ranks = {}
    if rank_keys and valid is not None and jax.process_count() > 1:
        # multi-host: the rank vectors are replicated (every process's
        # devices hold them) but the valid MASK is batch-sharded over
        # non-addressable devices — np.asarray on it would raise; gather
        # the global value onto every host first
        from jax.experimental import multihost_utils

        valid = multihost_utils.process_allgather(valid)
    for k in rank_keys:
        r = np.asarray(metrics.pop(k))
        # compact to valid rows; their relative order is dataset order (the
        # loader runs unshuffled — padding rows, wherever batches put them,
        # just drop out)
        ranks[k] = r[np.asarray(valid)] if valid is not None else r
    scalars = {k: float(v) for k, v in metrics.items()}
    return (scalars, ranks) if return_ranks else scalars


def format_table(metrics: dict[str, float], ks=(1, 5, 10, 50)) -> str:
    """Console table in the reference's eyeballable format (SURVEY.md sec 5:
    'same console table format so diffs are eyeballable')."""
    lines = []
    for direction, label in (("v2p", "Video to Paragraph"),
                             ("p2v", "Paragraph to Video")):
        rks = ", ".join(
            f"R@{k}: {metrics[f'{direction}_r@{k}']:.1f}" for k in ks
            if f"{direction}_r@{k}" in metrics
        )
        lines.append(
            f"{label}: {rks}, MedR: {metrics[f'{direction}_medr']:.1f}, "
            f"MeanR: {metrics[f'{direction}_meanr']:.1f}"
        )
    if "rsum" in metrics:
        lines.append(f"rsum: {metrics['rsum']:.1f}")
    return "\n".join(lines)


def evalrank(
    checkpoint_path: str,
    data_path: str | None = None,
    split: str = "val",
    ks: tuple[int, ...] = (1, 5, 10, 50),
    mesh=None,
    mode: str = "query",
    streaming: bool | None = None,
    dump_ranks: str | None = None,
) -> dict[str, float]:
    """Load a checkpoint and evaluate a split, printing the R@k table
    (mirrors the reference's ``python evaluation.py`` offline entry).

    ``dump_ranks``: also write one JSONL line per example —
    ``{"index", "key", "v2p_rank", "p2v_rank"}`` — for per-query error
    analysis and side-by-side diffing against a reference run (the
    reference only ever printed the aggregate table).
    """
    from cmhse_tpu.train.checkpoint import restore_for_eval
    from cmhse_tpu.data import PrecompDataset, Vocabulary, batches_from_dataset
    from cmhse_tpu.data.vocab import find_vocab

    if dump_ranks is not None:
        # fail on an unwritable dump path BEFORE the (possibly hours-long)
        # encode; create missing parent dirs, probe without truncating
        import os

        parent = os.path.dirname(os.path.abspath(dump_ranks))
        os.makedirs(parent, exist_ok=True)
        with open(dump_ranks, "a"):
            pass

    model, params, cfg = restore_for_eval(checkpoint_path)
    data_path = data_path or cfg.data.data_path
    vocab = Vocabulary.load(find_vocab(data_path))
    # flat (non-hierarchical) models consume the whole video as ONE clip and
    # the paragraph as ONE joined sentence — same flag the train CLI sets;
    # without it pad_batch would silently truncate to the first clip/sentence
    dataset = PrecompDataset(data_path, split, vocab,
                             feat_dim=cfg.data.feat_dim,
                             flat=not cfg.model.hierarchical)
    # multi-host: each process loads only its slice of every batch — the
    # mesh path of validate_metrics assembles the global arrays; feeding
    # full batches from every process would duplicate each gallery row
    # process_count times and silently inflate ranks
    batches = batches_from_dataset(
        dataset, cfg.data, shuffle=False,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    out = validate_metrics(model, params, batches, ks=ks, mesh=mesh,
                           mode=mode, streaming=streaming,
                           return_ranks=dump_ranks is not None)
    # table FIRST: a dump-write failure must not also lose the metrics
    print(format_table(out[0] if dump_ranks is not None else out, ks))
    if dump_ranks is not None:
        import json

        metrics, ranks = out
        v2p, p2v = ranks["v2p_ranks"], ranks["p2v_ranks"]
        keys = getattr(dataset, "keys", None)
        if jax.process_index() == 0:
            # one writer: on a pod every process reaches this line and the
            # dump path is shared storage (same policy as config.json)
            with open(dump_ranks, "w") as f:
                for i in range(len(v2p)):
                    f.write(json.dumps({
                        "index": i,
                        "key": keys[i] if keys is not None else i,
                        "v2p_rank": int(v2p[i]),
                        "p2v_rank": int(p2v[i]),
                    }) + "\n")
            print(f"wrote {len(v2p)} per-query ranks to {dump_ranks}")
    else:
        metrics = out
    return metrics
