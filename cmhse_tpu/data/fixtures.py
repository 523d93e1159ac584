"""Reference-layout dataset fixture generator (VERDICT r2 next-step 1).

Writes exactly the on-disk layout the reference's data pipeline consumed
(SURVEY.md C2/L0-L1): the ActivityNet-challenge style ``{split}_features.h5``
with per-video NESTED GROUPS (``f[key]['c3d_features']``), a
``{split}_captions.json`` mapping id -> {timestamps, sentences, duration},
plus word2vec vector files. A test driving the console entry points over a
directory produced here would run unchanged on a real downloaded
ActivityNet/DiDeMo feature directory — that is the fixture's design goal.

Lives in the installed package (not tests/) because driver-contract entry
points (``__graft_entry__.dryrun_multichip``'s daemon round) and the serving
bench/soak scripts need it in deployments that ship without the test tree
(ADVICE r4); ``tests/reference_layout.py`` re-exports it for the suite.
"""

from __future__ import annotations

import json
import os

import numpy as np

# small word pool -> deterministic multi-sentence "captions" with realistic
# punctuation (periods exercise the tokenizer's sentence handling)
_SUBJECTS = ["a man", "a woman", "the dog", "a child", "the chef"]
_VERBS = ["runs", "jumps", "walks", "cooks", "slides"]
_TAILS = ["in the park", "on the street", "near the lake", "at home",
          "down the hill"]


def make_sentence(rng: np.random.RandomState) -> str:
    return (f"{_SUBJECTS[rng.randint(len(_SUBJECTS))]} "
            f"{_VERBS[rng.randint(len(_VERBS))]} "
            f"{_TAILS[rng.randint(len(_TAILS))]}.")


def write_reference_dataset(
    root: str,
    n_train: int = 12,
    n_val: int = 8,
    feat_dim: int = 8,
    seed: int = 0,
    splits: list[tuple[str, int]] | None = None,
) -> dict:
    """Write train+val splits in the reference layout (or the given
    ``splits`` — e.g. a later-arriving ingest batch for the daemon's live
    "add" op); returns metadata."""
    import h5py

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    info: dict = {"feat_dim": feat_dim, "keys": {}}
    for split, n in (splits or (("train", n_train), ("val", n_val))):
        captions = {}
        h5_path = os.path.join(root, f"{split}_features.h5")
        with h5py.File(h5_path, "w") as f:
            for i in range(n):
                key = f"v_{split}{i:03d}"
                n_clips = int(rng.randint(1, 4))
                rows_per_clip = rng.randint(2, 5, size=n_clips)
                total = int(rows_per_clip.sum())
                feats = rng.randn(total, feat_dim).astype(np.float32)
                # challenge layout: the matrix nests inside a GROUP
                f.create_group(key).create_dataset("c3d_features", data=feats)
                duration = float(total)  # 1 feature row per "second"
                ts, t0 = [], 0
                for r in rows_per_clip:
                    ts.append([float(t0), float(t0 + int(r))])
                    t0 += int(r)
                captions[key] = {
                    "duration": duration,
                    "timestamps": ts,
                    "sentences": [make_sentence(rng) for _ in range(n_clips)],
                }
        with open(os.path.join(root, f"{split}_captions.json"), "w") as f:
            json.dump(captions, f)
        info["keys"][split] = sorted(captions)
    return info


def write_word2vec_bin(path: str, words: list[str], dim: int,
                       seed: int = 7) -> None:
    """Original word2vec C-binary file covering ``words`` (the format
    GoogleNews vectors ship in; exercises the .bin reader end-to-end)."""
    rng = np.random.RandomState(seed)
    with open(path, "wb") as f:
        f.write(f"{len(words)} {dim}\n".encode())
        for w in words:
            f.write(w.encode("utf-8") + b" ")
            f.write(rng.randn(dim).astype("<f4").tobytes())
            f.write(b"\n")


def splice_synthetic_gallery(ctx: dict, n: int, pad: int = 128,
                             seed: int = 0) -> np.ndarray:
    """Replace a serve-daemon context's startup gallery with ``n``
    synthetic unit-norm embedding rows (+ ``pad`` invalid tail-padding
    rows), keyed ``v_syn...`` — the documented hand-assembled-context
    embedding path, laid out exactly as ``build_context`` produces
    (PreparedGallery invariant: slot ``s < n`` IS gallery row ``s``,
    padding only at the tail). Lets the daemon serve a STREAMING-scale
    gallery without encoding ``n`` real videos. One shared implementation
    (tests/test_serve_streaming_scale.py + scripts/serve_soak.py) so the
    splice cannot drift from the daemon's layout. Returns the row matrix
    (pad rows included)."""
    import jax.numpy as jnp  # deferred: keep fixture writing jax-free

    r = ctx["retriever"]
    embed = int(r.gallery.shape[1])
    rng = np.random.RandomState(seed)
    v = rng.randn(n + pad, embed).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    ids = np.concatenate([np.arange(n), np.zeros(pad, np.int64)])
    keys = [f"v_syn{i:06d}" for i in range(n)]
    ctx["keys"] = list(keys)
    ctx["key_set"] = set(keys)
    ctx["key_to_row"] = {k: i for i, k in enumerate(keys)}
    r.build_gallery(encoded=(jnp.asarray(v), jnp.asarray(v), valid, ids))
    ctx["retriever_text"] = None
    # the startup build_text_side closure still closes over the ORIGINAL
    # startup text encode (64 rows, ids into the OLD key table): letting a
    # later video_key request consume it would resolve startup-row ids
    # against the spliced v_syn key table — well-formed but WRONG names
    # with no error (review r5). Drop it so the daemon's "text side
    # unavailable" guard answers instead.
    ctx["build_text_side"] = None
    ctx["added"].clear()
    ctx["removed_ids"].clear()
    ctx["removed_keys"].clear()
    return v
