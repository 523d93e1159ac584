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
    p.add_argument("--data_name", default="anet_precomp")
    p.add_argument("--split", default="train")
    p.add_argument("--threshold", type=int, default=4)
    p.add_argument("--out", default=None,
                   help="output path (.json or .pkl); default "
                        "<data_path>/vocab.json")
    args = p.parse_args(argv)

    from cmhse_tpu.data.vocab import build_vocab

    cap_path = os.path.join(args.data_path, f"{args.split}_captions.json")
    with open(cap_path) as f:
        captions_meta = json.load(f)
    captions = [s for meta in captions_meta.values()
                for s in meta["sentences"]]
    vocab = build_vocab(captions, threshold=args.threshold)
    out = args.out or os.path.join(args.data_path, "vocab.json")
    vocab.save(out)
    print(f"vocabulary: {len(vocab)} words -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
