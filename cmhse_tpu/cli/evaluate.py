"""``cmhse-eval`` — offline retrieval evaluation (the reference's
``python evaluation.py`` entry; SURVEY.md section 3.2)."""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser("cmhse-eval")
    p.add_argument("checkpoint", help="checkpoint directory (with config.json)")
    p.add_argument("--data_path", default=None)
    p.add_argument("--split", default="val")
    p.add_argument("--ks", default="1,5,10,50")
    p.add_argument("--sharded", action="store_true",
                   help="shard the gallery across all visible devices")
    p.add_argument("--mode", default="query", choices=["query", "gallery"])
    p.add_argument("--streaming", action="store_true", default=None,
                   help="force the streaming rank-count kernel (no [Q, N] "
                        "similarity block); default: auto by gallery size")
    p.add_argument("--no_streaming", dest="streaming", action="store_false")
    p.add_argument("--profile_dir", default=None,
                   help="wrap the evaluation in a jax.profiler trace to "
                        "this dir (parse with cmhse_tpu.utils.profiling)")
    p.add_argument("--dump_ranks", default=None, metavar="PATH",
                   help="write per-query JSONL (index/key/v2p_rank/p2v_rank) "
                        "for error analysis; identical across backends")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])

    from cmhse_tpu.utils.compile_cache import add_cli_flag

    add_cli_flag(p, "Re-evaluating checkpoints of the same config (the "
                    "training-sweep pattern) skips the encode/rank "
                    "compiles after the first run.")
    args = p.parse_args(argv)

    from cmhse_tpu.cli.train import _force_platform

    _force_platform(args.platform)

    from cmhse_tpu.eval.retrieval import evalrank
    from cmhse_tpu.utils.timing import profiler_trace

    mesh = None
    if args.sharded:
        from cmhse_tpu.parallel.mesh import (make_mesh,
                                             maybe_initialize_distributed)

        # on a pod, skipping this leaves jax.process_count() == 1 on every
        # host: each would then load the FULL split, mesh only its local
        # devices, and every host would pass the one-writer dump gate —
        # same call the train CLI makes (cli/train.py)
        maybe_initialize_distributed()
        mesh = make_mesh((-1,), ("data",))

    # AFTER maybe_initialize_distributed: enable_from_cli's guard refuses
    # under a live jax.distributed client (the CLAUDE.md multi-process
    # deserialization hang), so pod runs stay uncached and single-process
    # runs get the re-eval speedup
    from cmhse_tpu.utils.compile_cache import enable_from_cli

    enable_from_cli(args.compile_cache, "cmhse-eval")

    ks = tuple(int(k) for k in args.ks.split(","))
    with profiler_trace(args.profile_dir):
        evalrank(args.checkpoint, data_path=args.data_path, split=args.split,
                 ks=ks, mesh=mesh, mode=args.mode, streaming=args.streaming,
                 dump_ranks=args.dump_ranks)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
