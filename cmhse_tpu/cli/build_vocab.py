"""``cmhse-vocab`` — the reference's ``python vocab.py`` entry
(SURVEY.md section 3.4): tokenize all train captions, frequency-threshold,
serialize."""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser("cmhse-vocab")
    p.add_argument("--data_path", required=True)
    p.add_argument("--data_name", default=None,
                   help="optional dataset subdirectory under --data_path "
                        "(the reference's vocab.py layout: "
                        "<data_path>/<data_name>/{split}_captions.json); "
                        "omit when --data_path points at the dataset dir "
                        "directly")
    p.add_argument("--split", default="train")
    p.add_argument("--threshold", type=int, default=4)
    p.add_argument("--out", default=None,
                   help="output path (.json or .pkl); default "
                        "<data_path>/vocab.json")
    args = p.parse_args(argv)

    from cmhse_tpu.data.vocab import build_vocab

    # the reference nests datasets as <data_path>/<data_name>/...; this
    # flag used to be accepted and silently ignored (review r5)
    root = (os.path.join(args.data_path, args.data_name)
            if args.data_name else args.data_path)
    cap_path = os.path.join(root, f"{args.split}_captions.json")
    if args.data_name and not os.path.exists(cap_path):
        raise SystemExit(
            f"no {args.split}_captions.json under {root}; --data_name "
            "selects a dataset SUBDIRECTORY of --data_path — omit it if "
            "--data_path already points at the dataset directory")
    with open(cap_path) as f:
        captions_meta = json.load(f)
    captions = [s for meta in captions_meta.values()
                for s in meta["sentences"]]
    vocab = build_vocab(captions, threshold=args.threshold)
    out = args.out or os.path.join(root, "vocab.json")
    vocab.save(out)
    print(f"vocabulary: {len(vocab)} words -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
