"""``cmhse-retrieve`` — text->video retrieval against an encoded gallery
(the serving surface over :class:`cmhse_tpu.eval.serve.Retriever`; the
reference has no serving path — SURVEY.md section 3.5)."""

from __future__ import annotations

import argparse


def _connect_main(args, p) -> int:
    """``--connect`` mode: query a RUNNING ``cmhse-serve`` daemon through
    :class:`cmhse_tpu.client.ServeClient` instead of loading a checkpoint —
    no jax, no model restore, no gallery encode; the daemon (ideally
    started ``--warm``) already holds everything on device."""
    import sys

    from cmhse_tpu.client import ServeClient, ServeError

    daemon_side = [name for name, v in (("--data_path", args.data_path),
                                        ("--split" , args.split != "val"),
                                        ("--sharded", args.sharded),
                                        ("--quantized", args.quantized),
                                        ("--rescore_m", args.rescore_m),
                                        ("--vocab_path", args.vocab_path),
                                        ("--platform", args.platform)) if v]
    if daemon_side:
        p.error(f"{', '.join(daemon_side)} configure the GALLERY and are "
                "daemon-side; set them on cmhse-serve, not with --connect")
    addr = args.connect
    host, _, port = addr.rpartition(":")
    kw = ({"tcp": (host, int(port))} if host and port.isdigit()
          else {"socket_path": addr})

    def _print_hits(label, hits):
        print(label)
        for rank, h in enumerate(hits, start=1):
            print(f"  {rank}. {h['key']}  score={h['score']:.4f}")

    with ServeClient(**kw) as c:
        try:
            if args.query:
                for text, hits in zip(args.query,
                                      c.query(args.query, k=args.k)):
                    _print_hits(f"query: {text!r}", hits)
            for key in args.query_video or ():
                _print_hits(f"video query: {key!r} (paragraphs)",
                            c.query_video(key, k=args.k))
        except ServeError as e:
            raise SystemExit(f"daemon refused: {e}")
        if args.interactive:
            for line in sys.stdin:
                text = line.strip()
                if not text:
                    continue
                try:
                    _print_hits(f"query: {text!r}", c.query(text, k=args.k))
                except ServeError as e:
                    print(f"error: {e}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser("cmhse-retrieve")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="checkpoint dir (with config.json); omit with "
                        "--connect")
    p.add_argument("--connect", default=None, metavar="ADDR",
                   help="query a running cmhse-serve daemon instead of "
                        "loading a checkpoint: a unix socket path, or "
                        "HOST:PORT for a --tcp daemon")
    p.add_argument("--data_path", default=None)
    p.add_argument("--split", default="val", help="gallery split")
    p.add_argument("--query", action="append", default=None,
                   help="natural-language query: text->video direction "
                        "(repeatable)")
    p.add_argument("--query_video", action="append", default=None,
                   help="dataset video key used as the query: "
                        "video->paragraph direction (repeatable)")
    p.add_argument("--interactive", action="store_true",
                   help="after any --query flags, read further text queries "
                        "from stdin (one per line) against the SAME encoded "
                        "gallery — the encode-once/serve-many pattern")
    p.add_argument("-k", type=int, default=5)
    p.add_argument("--sharded", action="store_true")
    p.add_argument("--quantized", action="store_true",
                   help="two-stage int8 serving for million-row galleries "
                        "(2.1x QPS at 1M; exact rescoring of the "
                        "int8-preselected pool — see ops/topk.py; with "
                        "--sharded it runs per gallery shard). No effect "
                        "on small galleries")
    p.add_argument("--rescore_m", type=int, default=None,
                   help="int8 candidate-pool depth for --quantized (the "
                        "recall dial; default max(64, 4k))")
    p.add_argument("--vocab_path", default=None,
                   help="default: vocab.json/vocab.pkl under the data dir")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])

    from cmhse_tpu.utils.compile_cache import add_cli_flag

    add_cli_flag(p, "A repeat invocation (the one-shot CLI pattern: same "
                    "checkpoint, new queries) skips its multi-second "
                    "encode/query compiles.")
    args = p.parse_args(argv)

    if not args.query and not args.query_video and not args.interactive:
        p.error("pass --query (text->video), --query_video "
                "(video->paragraph), or --interactive")
    if args.connect:
        return _connect_main(args, p)
    if args.checkpoint is None:
        p.error("pass a checkpoint dir (or --connect ADDR)")

    from cmhse_tpu.cli.train import _force_platform

    _force_platform(args.platform)
    # always single-process (the --connect path returned above); persists
    # the encode + per-k query programs a repeat run would recompile
    from cmhse_tpu.utils.compile_cache import enable_from_cli

    enable_from_cli(args.compile_cache, "cmhse-retrieve")

    from cmhse_tpu.data import PrecompDataset, Vocabulary, batches_from_dataset
    from cmhse_tpu.eval.serve import Retriever
    from cmhse_tpu.train.checkpoint import restore_for_eval

    from cmhse_tpu.data.vocab import find_vocab

    model, params, cfg = restore_for_eval(args.checkpoint)
    data_path = args.data_path or cfg.data.data_path
    vocab = Vocabulary.load(find_vocab(data_path, args.vocab_path))
    dataset = PrecompDataset(data_path, args.split, vocab,
                             feat_dim=cfg.data.feat_dim,
                             flat=not cfg.model.hierarchical)

    mesh = None
    if args.sharded:
        from cmhse_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((-1,), ("data",))

    def _print_hits(label, scores, idx, retriever):
        print(label)
        for rank, (j, s) in enumerate(zip(idx, scores), start=1):
            key = dataset.keys[int(retriever.gallery_keys[int(j)])] \
                if retriever.gallery_keys is not None else int(j)
            print(f"  {rank}. {key}  score={float(s):.4f}")

    # both directions requested: encode the split ONCE (the encode pass
    # already produces both modalities' embeddings) and build the two
    # galleries from the same tuple
    encoded = None
    if (args.query or args.interactive) and args.query_video:
        from cmhse_tpu.eval.encode import encode_gallery_device

        encoded = encode_gallery_device(
            model, params,
            batches_from_dataset(dataset, cfg.data, shuffle=False),
            return_ids=True,
        )

    if args.query or args.interactive:
        retriever = Retriever(model, params, mesh=mesh,
                              quantize=args.quantized,
                              rescore_m=args.rescore_m)
        retriever.build_gallery(
            batches_from_dataset(dataset, cfg.data, shuffle=False)
            if encoded is None else None,
            keys=None, side="video", encoded=encoded,
        )
        from cmhse_tpu.eval.serve import text_query_batch

        smax, wmax = cfg.data.max_sentences, cfg.data.max_words

        def _text_batch(texts):
            return text_query_batch(vocab, texts, smax, wmax)

        if args.query:
            scores, idx = retriever.retrieve(*_text_batch(args.query),
                                             k=args.k)
            for i, text in enumerate(args.query):
                _print_hits(f"query: {text!r}", scores[i], idx[i], retriever)
        if args.interactive:
            # encode-once/serve-many: the gallery (pre-chunked when large)
            # stays on device; each stdin line is one query
            import sys

            for line in sys.stdin:
                text = line.strip()
                if not text:
                    continue
                scores, idx = retriever.retrieve(*_text_batch([text]),
                                                 k=args.k)
                _print_hits(f"query: {text!r}", scores[0], idx[0], retriever)

    if args.query_video:
        # video->paragraph: TEXT gallery, video queries looked up by key
        from cmhse_tpu.eval.serve import video_query_batch

        retriever_t = Retriever(model, params, mesh=mesh,
                                quantize=args.quantized,
                                rescore_m=args.rescore_m)
        retriever_t.build_gallery(
            batches_from_dataset(dataset, cfg.data, shuffle=False)
            if encoded is None else None,
            keys=None, side="text", encoded=encoded,
        )
        try:
            qframes, qframe_len, qclip_len = video_query_batch(
                dataset, cfg.data, args.query_video)
        except KeyError as e:
            raise SystemExit(
                f"video keys not in the {args.split} split: {e.args[0]}")
        scores, idx = retriever_t.retrieve_video(
            qframes, qframe_len, qclip_len, k=args.k
        )
        for i, kq in enumerate(args.query_video):
            _print_hits(f"video query: {kq!r} (paragraphs)", scores[i],
                        idx[i], retriever_t)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
