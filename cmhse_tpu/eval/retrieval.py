"""Offline retrieval evaluation (rebuilds SURVEY.md C12 + section 3.2: the
reference's ``evaluation.py`` ``evalrank()`` entry — encode the whole split,
score, print the R@k table both directions).

The similarity matrix and ranking run on device (single chip via
``bidirectional_metrics``; sharded across a mesh via
``sharded_retrieval_metrics`` when one is given).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmhse_tpu.eval.encode import encode_data
from cmhse_tpu.ops.ranking import bidirectional_metrics
from cmhse_tpu.ops.similarity import cosine_sim


def validate_metrics(
    model,
    params,
    batches,
    ks: tuple[int, ...] = (1, 5, 10, 50),
    mesh=None,
    mode: str = "query",
) -> dict[str, float]:
    """Encode a split and compute bidirectional retrieval metrics.

    With ``mesh`` the gallery is sharded (BASELINE config 5); without, the
    single-device on-device path runs. Returns plain floats.
    """
    if mesh is not None:
        # fully device-resident path: encode -> sharded rank counting ->
        # masked reductions; only the final scalars cross to the host
        from cmhse_tpu.eval.encode import encode_gallery_device
        from cmhse_tpu.parallel.eval_sharded import sharded_retrieval_metrics

        video_embs, para_embs, valid = encode_gallery_device(
            model, params, batches
        )
        metrics = sharded_retrieval_metrics(
            video_embs, para_embs, mesh, ks=ks, mode=mode, valid=valid
        )
    else:
        video_embs, para_embs, _ = encode_data(model, params, batches)
        sims = cosine_sim(video_embs, para_embs)
        metrics = bidirectional_metrics(sims, ks=ks)
    return {k: float(v) for k, v in metrics.items()}


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
) -> dict[str, float]:
    """Load a checkpoint and evaluate a split, printing the R@k table
    (mirrors the reference's ``python evaluation.py`` offline entry)."""
    from cmhse_tpu.train.checkpoint import restore_for_eval
    from cmhse_tpu.data import PrecompDataset, Vocabulary, batches_from_dataset

    model, params, cfg = restore_for_eval(checkpoint_path)
    data_path = data_path or cfg.data.data_path
    vocab = Vocabulary.load(f"{data_path}/vocab.json")
    dataset = PrecompDataset(data_path, split, vocab, feat_dim=cfg.data.feat_dim)
    batches = batches_from_dataset(dataset, cfg.data, shuffle=False)
    metrics = validate_metrics(model, params, batches, ks=ks, mesh=mesh)
    print(format_table(metrics, ks))
    return metrics
