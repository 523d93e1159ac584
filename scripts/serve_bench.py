"""Daemon concurrent-client throughput A/B: is --batch_window_ms worth it?

VERDICT r3 task 7 ("measure first, keep only if it wins"): N client threads
each stream sequential single-text queries at ONE real ``cmhse-serve``
daemon over a unix socket, and the measured QPS is compared across
batch-window settings. Window 0 is today's behavior (each query takes the
request lock and runs its own encode+GEMM device call); a positive window
makes the first query of a window absorb its contemporaries into one
batched device call (``_QueryBatcher``).

The daemon context is built ONCE (the gallery encode is the expensive
part) and the batcher is hot-swapped between phases while no requests are
in flight — exactly what ``build_context(batch_window_ms=...)`` wires up,
without re-encoding per phase.

Run on an idle host: ``python scripts/serve_bench.py`` (real chip) or
``python scripts/serve_bench.py --platform cpu`` (smoke). Prints one JSON
summary line; record results in PERFORMANCE.md ("Serving daemon" section).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def _build_fixture(td: str, n_val: int, feat_dim: int, embed: int):
    """Reference-layout data + an initialized checkpoint sized for a
    realistic per-query device cost (the fixture generator's tests-scale
    defaults would understate the batching win's denominator)."""
    from cmhse_tpu.data.fixtures import write_reference_dataset

    from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
    from cmhse_tpu.data import PrecompDataset, batches_from_dataset
    from cmhse_tpu.data.vocab import build_vocab
    from cmhse_tpu.train import create_train_state
    from cmhse_tpu.train.checkpoint import CheckpointManager

    import jax

    root = os.path.join(td, "data")
    write_reference_dataset(root, n_train=6, n_val=n_val, feat_dim=feat_dim)
    with open(os.path.join(root, "train_captions.json")) as f:
        caps = json.load(f)
    vocab = build_vocab(
        [s for c in caps.values() for s in c["sentences"]], threshold=1)
    vocab.save(os.path.join(root, "vocab.json"))
    cfg = ExperimentConfig(
        data=DataConfig(data_path=root, batch_size=32, feat_dim=feat_dim,
                        vocab_size=len(vocab) + 8, max_clips=3,
                        max_frames=6, max_sentences=3, max_words=8),
        model=ModelConfig(embed_size=embed, word_dim=embed // 2,
                          feat_dim=feat_dim, rnn_hidden=embed // 2),
    )
    ds = PrecompDataset(root, "val", vocab, feat_dim=feat_dim)
    b0 = next(iter(batches_from_dataset(ds, cfg.data, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), b0)
    ckpt_dir = os.path.join(td, "ckpt")
    mgr = CheckpointManager(ckpt_dir, cfg)
    mgr.save(state, epoch=0, best_rsum=0.0, is_best=True)
    mgr.close()
    return root, ckpt_dir


def _measure(sock_path: str, clients: int,
             queries: int) -> tuple[float, float]:
    """``clients`` threads x ``queries`` sequential single-text queries
    each, against the live daemon. Returns ``(QPS, client-observed p50
    ms)`` — the latency is stamped around the wire round-trip, so it
    includes the batch window's queueing delay (the cost the adaptive
    close exists to shave for lone clients)."""
    from cmhse_tpu.client import ServeClient

    texts = ["a man runs down the street", "a dog jumps over a fence",
             "two people talk in a kitchen", "a car drives past a house"]
    barrier = threading.Barrier(clients + 1)
    errors: list = []
    lat_lock = threading.Lock()
    lats: list = []

    def worker(ci: int):
        try:
            local = []
            with ServeClient(socket_path=sock_path, timeout=120) as c:
                barrier.wait()
                for qi in range(queries):
                    t0 = time.perf_counter()
                    c.query(texts[(ci + qi) % len(texts)], k=5)
                    local.append(time.perf_counter() - t0)
            with lat_lock:
                lats.extend(local)
        except Exception as e:
            errors.append(f"client {ci}: {type(e).__name__}: {e}")
            # a worker that died BEFORE its barrier.wait (connect refused,
            # daemon down) would otherwise leave the main thread blocked
            # forever on the timeout-less wait below — break the barrier
            # so the error surfaces instead
            barrier.abort()

    threads = [threading.Thread(target=worker, args=(ci,))
               for ci in range(clients)]
    for t in threads:
        t.start()
    try:
        barrier.wait()
    except threading.BrokenBarrierError:
        pass  # a worker aborted; fall through to join + error report
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    if errors:
        raise RuntimeError("; ".join(errors))
    lats.sort()
    p50 = lats[len(lats) // 2] * 1e3
    return clients * queries / dt, p50


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--queries", type=int, default=50,
                   help="sequential queries per client per phase")
    p.add_argument("--lone_queries", type=int, default=100,
                   help="queries for the single-client latency pass")
    p.add_argument("--windows", type=float, nargs="+",
                   default=[0.0, 2.0, 5.0, 10.0], metavar="MS")
    p.add_argument("--n_val", type=int, default=64,
                   help="gallery items (startup encode cost scales with it)")
    p.add_argument("--feat_dim", type=int, default=512)
    p.add_argument("--embed", type=int, default=512)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import bench

    bench._enable_compile_cache()
    from cmhse_tpu.cli import serve_daemon
    from cmhse_tpu.cli.serve_daemon import _QueryBatcher

    out = {"clients": args.clients, "queries_per_client": args.queries,
           "gallery_items": args.n_val, "embed": args.embed, "qps": {},
           "p50_ms": {}, "lone_qps": {}, "lone_p50_ms": {}}
    with tempfile.TemporaryDirectory() as td:
        root, ckpt_dir = _build_fixture(td, args.n_val, args.feat_dim,
                                        args.embed)
        ctx = serve_daemon.build_context(ckpt_dir, root, "val")
        sock_path = os.path.join(td, "serve.sock")
        ready = threading.Event()
        srv = threading.Thread(
            target=serve_daemon.serve_forever,
            args=(ctx, sock_path),
            kwargs={"ready_callback": ready.set}, daemon=True)
        srv.start()
        assert ready.wait(timeout=300), "daemon never came up"

        # warm: compile the query path once before any timed phase —
        # including the power-of-two merge buckets the batcher phases will
        # run at (mirrors the CLI's --warm; without this the first
        # positive-window phase absorbs multi-second XLA compiles and the
        # A/B is contaminated, see PERFORMANCE.md "Static-shape bucketing")
        _measure(sock_path, clients=1, queries=3)
        for nb in (2, 4, 8):
            serve_daemon._handle_request(
                {"query": ["warm up the encoder"] * nb, "k": 5}, ctx)

        # each positive window runs two arms: the adaptive early close
        # (0.5 ms quiet gap — must be EXPLICIT: the class default is now
        # the plain sleep after the A/B measured adaptive OFF, so passing
        # None would compare plain vs plain) and the plain full-window
        # sleep (production default) — plus a LONE-client pass per phase,
        # the case whose latency the adaptive close exists to rescue
        # (VERDICT r4 weak 4)
        phases = []
        for w in args.windows:
            if w <= 0:
                phases.append((0.0, None, "window_0ms"))
            else:
                phases.append((w, 0.0005, f"window_{w:g}ms_adaptive"))
                phases.append((w, 0.0, f"window_{w:g}ms_plain"))
        for w, gap, name in phases:
            # hot-swap the batcher between phases (no requests in flight)
            ctx["batcher"] = (_QueryBatcher(ctx, w / 1e3, quiet_gap_s=gap)
                              if w > 0 else None)
            qps, p50 = _measure(sock_path, args.clients, args.queries)
            lone_qps, lone_p50 = _measure(sock_path, 1, args.lone_queries)
            out["qps"][name] = round(qps, 1)
            out["p50_ms"][name] = round(p50, 2)
            out["lone_qps"][name] = round(lone_qps, 1)
            out["lone_p50_ms"][name] = round(lone_p50, 2)
            base = out["qps"].get("window_0ms")
            rel = (f" ({qps / base:.2f}x window 0)"
                   if base and w > 0 else "")
            print(f"{name}: {qps:,.1f} QPS p50 {p50:.2f} ms | lone "
                  f"p50 {lone_p50:.2f} ms{rel}", flush=True)

        from cmhse_tpu.client import ServeClient

        with ServeClient(socket_path=sock_path, timeout=30) as c:
            c.request({"op": "shutdown"})
        srv.join(timeout=30)
    base = out["qps"].get("window_0ms")
    if base:
        best_w, best = max(((k, v) for k, v in out["qps"].items()),
                           key=lambda kv: kv[1])
        out["best_window"] = best_w
        out["best_speedup_vs_unbatched"] = round(best / base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
