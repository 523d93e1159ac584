"""Daemon soak: sustained mixed load against one live ``cmhse-serve``.

Production-stability evidence the one-shot tests can't give: N client
threads stream text queries (through ``--batch_window_ms`` merging) while
one churn client cycles add -> remove through the live-ingest path,
crossing the auto-compaction threshold repeatedly, for ``--seconds`` of
wall clock. At the end: zero errored requests, the gallery is exactly the
fixture again, stats quantiles are sane, and the daemon shuts down
cleanly (rc=0).

Run on the real chip, idle host: ``python scripts/serve_soak.py``
(``--platform cpu`` for a smoke). Prints one JSON summary line; record
results in PERFORMANCE.md ("Daemon cross-connection query batching").
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


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--seconds", type=float, default=300.0)
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--batch_window_ms", type=float, default=5.0)
    p.add_argument("--n_val", type=int, default=64)
    p.add_argument("--feat_dim", type=int, default=512)
    p.add_argument("--embed", type=int, default=512)
    p.add_argument("--synthetic_gallery", type=int, default=0, metavar="N",
                   help="replace the startup gallery with N synthetic "
                        "embedding rows (>= 32768 engages the STREAMING "
                        "serving path inside the daemon — the scale the "
                        "serving claims are about; encoding that many real "
                        "videos through the fixture model is infeasible)")
    p.add_argument("--compact_threshold", type=float, default=0.05,
                   help="auto-compaction threshold; for a big "
                        "--synthetic_gallery pass ~3e-5 so the 4-row churn "
                        "still crosses it and compaction of the LARGE "
                        "gallery races queries every cycle")
    p.add_argument("--quantized", action="store_true",
                   help="serve the int8 two-stage path (pairs with a "
                        "million-scale --synthetic_gallery)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import bench

    bench._enable_compile_cache()
    from serve_bench import _build_fixture

    from cmhse_tpu.data.fixtures import write_reference_dataset
    from cmhse_tpu.cli import serve_daemon
    from cmhse_tpu.client import ServeClient

    out = {"seconds": args.seconds, "clients": args.clients,
           "batch_window_ms": args.batch_window_ms}
    errors: list = []
    q_counts = [0] * args.clients  # per-thread: no shared-counter race
    cyc_count = [0]
    stop = threading.Event()

    with tempfile.TemporaryDirectory() as td:
        root, ckpt_dir = _build_fixture(td, args.n_val, args.feat_dim,
                                        args.embed)
        churn_dir = os.path.join(td, "churn")
        write_reference_dataset(churn_dir, feat_dim=args.feat_dim, seed=99,
                                splits=[("churn", 4)])
        ctx = serve_daemon.build_context(
            ckpt_dir, root, "val", allow_any_path=True,
            quantized=args.quantized,
            compact_threshold=args.compact_threshold,
            batch_window_ms=args.batch_window_ms)
        if args.synthetic_gallery:
            # shared with tests/test_serve_streaming_scale.py so the splice
            # cannot drift from build_context's layout
            from cmhse_tpu.data.fixtures import splice_synthetic_gallery
            splice_synthetic_gallery(ctx, args.synthetic_gallery)
        sock_path = os.path.join(td, "serve.sock")
        ready = threading.Event()
        srv = threading.Thread(
            target=serve_daemon.serve_forever, args=(ctx, sock_path),
            kwargs={"ready_callback": ready.set}, daemon=True)
        srv.start()
        assert ready.wait(timeout=300), "daemon never came up"

        texts = ["a man runs down the street", "a dog jumps over a fence",
                 "two people talk in a kitchen", "a car drives past a house"]

        def querier(ci: int):
            try:
                with ServeClient(socket_path=sock_path, timeout=120) as c:
                    n = 0
                    while not stop.is_set():
                        hits = c.query(texts[(ci + n) % len(texts)], k=5)
                        assert len(hits) == 5, hits
                        q_counts[ci] += 1
                        n += 1
            except Exception as e:
                errors.append(f"querier {ci}: {type(e).__name__}: {e}")

        def churner():
            churn_keys = [f"v_churn{i:03d}" for i in range(4)]
            try:
                with ServeClient(socket_path=sock_path, timeout=300) as c:
                    while not stop.is_set():
                        r = c.request({"op": "add", "split": "churn",
                                       "data_path": churn_dir})
                        assert r.get("added") == 4, r
                        time.sleep(0.2)  # let queries see the grown gallery
                        r = c.request({"op": "remove", "keys": churn_keys})
                        assert r.get("removed") == 4, r
                        cyc_count[0] += 1
            except Exception as e:
                errors.append(f"churner: {type(e).__name__}: {e}")

        threads = ([threading.Thread(target=querier, args=(ci,))
                    for ci in range(args.clients)]
                   + [threading.Thread(target=churner)])
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(args.seconds)
        stop.set()
        for t in threads:
            t.join(timeout=600)
        elapsed = time.perf_counter() - t0
        alive = [t for t in threads if t.is_alive()]

        with ServeClient(socket_path=sock_path, timeout=120) as c:
            st = c.request({"op": "stats"})
            final_hits = c.query(texts[0], k=args.n_val)
            assert c.request({"op": "shutdown"}).get("ok")
        srv.join(timeout=60)

    out.update({
        "elapsed_s": round(elapsed, 1),
        "errors": errors,
        "stuck_threads": len(alive),
        "queries": sum(q_counts),
        "add_remove_cycles": cyc_count[0],
        "qps": round(sum(q_counts) / elapsed, 1),
        "requests_served": st.get("requests_served"),
        "compactions": st.get("compactions"),
        "latency_ms_p50": st.get("latency_ms_p50"),
        "latency_ms_p99": st.get("latency_ms_p99"),
        "final_gallery_rows": st.get("gallery_rows"),
        "final_valid_rows": st.get("valid_rows"),
    })
    expected_valid = args.synthetic_gallery or args.n_val
    out["synthetic_gallery"] = args.synthetic_gallery
    out["quantized"] = args.quantized
    out["streaming_engaged"] = bool(st.get("prepared"))
    ok = (not errors and not alive
          and st.get("valid_rows") == expected_valid
          and all(not h["key"].startswith("v_churn")
                  for h in final_hits))
    out["ok"] = bool(ok)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
