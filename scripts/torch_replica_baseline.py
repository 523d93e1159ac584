"""Measure the torch reference-replica's encode throughput on this host's
CPU — the measured half of bench.py's ``vs_baseline`` denominator.

The reference itself (zbwglory/CMHSE) is unavailable (empty mount, no
network — SURVEY.md §0) and never published throughput, so bench.py's
``EST_REF_PAIRS_PER_SEC = 150`` has been a documented recall-based
estimate for a 2018-era GPU. ``tests/torch_replica.py`` IS a faithful
replica of the reference model (packed-sequence cuDNN-semantics GRUs,
same shapes; parity-pinned against the JAX rebuild by
tests/test_reference_parity.py), and torch (CPU) is installed — so the
one measurable anchor this environment permits is the replica's
*CPU* encode rate at the exact headline shape bench.py times on TPU
(B x 8 clips x 64 frames, H=1024, attention pooling, hierarchical).

This does NOT replace the GPU estimate (a 2018 GPU is ~10-100x a single
CPU core on these GEMM-bound GRUs); it replaces *recall* with a
*measurement* plus an explicit scaling argument, recorded in BASELINE.md
("Measured replica anchor"). Run on the idle host (never concurrently
with a TPU bench — 1 core):

    python scripts/torch_replica_baseline.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tests"))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--batch", type=int, default=64,
                   help="videos per batch (the reference's train default "
                        "era used 64; bench.py's TPU headline is 128 — "
                        "per-pair cost is shape-dominated, not batch-"
                        "dominated, on CPU)")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import numpy as np
    import torch

    import bench
    from torch_replica import TorchCMHSE

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    rng = np.random.RandomState(0)

    b = args.batch
    model = TorchCMHSE(
        vocab=bench.VOCAB, word_dim=bench.WORD_DIM, feat_dim=bench.FEAT_DIM,
        hidden=bench.HIDDEN, embed=bench.EMBED, hierarchical=True,
        attention_pool=True)
    model.eval()

    frames = rng.randn(b, bench.MAX_CLIPS, bench.MAX_FRAMES,
                       bench.FEAT_DIM).astype(np.float32)
    frame_len = np.full((b, bench.MAX_CLIPS), bench.MAX_FRAMES, np.int64)
    clip_len = np.full((b,), bench.MAX_CLIPS, np.int64)
    words = rng.randint(1, bench.VOCAB,
                        (b, bench.MAX_SENTENCES, bench.MAX_WORDS)
                        ).astype(np.int64)
    word_len = np.full((b, bench.MAX_SENTENCES), bench.MAX_WORDS, np.int64)
    sent_len = np.full((b,), bench.MAX_SENTENCES, np.int64)

    def encode_once():
        with torch.no_grad():
            v, _ = model.encode_video(frames, frame_len, clip_len)
            t, _ = model.encode_text(words, word_len, sent_len)
        return float(v.sum() + t.sum())

    encode_once()  # warm allocators / oneDNN weight reorders
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        encode_once()
        times.append(time.perf_counter() - t0)
    best = min(times)  # least-interference sample on a shared host
    pairs_per_sec = b / best
    out = {
        "what": "torch replica (reference-model semantics) CPU encode",
        "batch": b,
        "shape": f"{bench.MAX_CLIPS}x{bench.MAX_FRAMES} frames, "
                 f"{bench.MAX_SENTENCES}x{bench.MAX_WORDS} words, "
                 f"H={bench.HIDDEN}",
        "torch": torch.__version__,
        "threads": torch.get_num_threads(),
        "sec_per_batch": round(best, 3),
        "all_reps_sec": [round(t, 3) for t in times],
        "pairs_per_sec_cpu": round(pairs_per_sec, 2),
        "est_ref_pairs_per_sec_gpu": bench.EST_REF_PAIRS_PER_SEC,
        "implied_gpu_over_cpu": round(
            bench.EST_REF_PAIRS_PER_SEC / pairs_per_sec, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
