"""The daemon at STREAMING scale (VERDICT r4 weak 5): every prior daemon
test served a tens-of-rows gallery, so ``should_stream_topk`` never
engaged inside the daemon path and the dispatch seams the 100k/1M serving
claims rest on (prepared-form queries, append_to_prepared ingest, online
compaction of a chunked gallery) were only pinned at the Retriever level.
Here a 40k-row synthetic gallery (>= STREAMING_GALLERY_MIN = 32768) is
spliced into a REAL daemon context — the documented hand-assembled-
context embedding use case — and driven end-to-end over a unix socket:
warm + batched queries, live add, a threshold-crossing remove with
auto-compaction, stats, shutdown.
"""

import json
import socket
import threading

from test_serve_daemon import _fixture_run

from cmhse_tpu.cli import serve_daemon
from cmhse_tpu.data.fixtures import splice_synthetic_gallery
from cmhse_tpu.ops.pallas_sim import STREAMING_GALLERY_MIN
from cmhse_tpu.ops.topk import should_stream_topk

N_ROWS = 40_000
N_PAD = 128  # trailing encode-padding rows, invalid (fixtures.py default)


def test_daemon_streaming_scale(tmp_path_factory, tmp_path):
    root, ckpt_dir = _fixture_run(tmp_path_factory, "streamscale")
    ctx = serve_daemon.build_context(
        ckpt_dir, str(root), "val", compact_threshold=0.012,
        batch_window_ms=2.0)
    splice_synthetic_gallery(ctx, N_ROWS, pad=N_PAD)
    r = ctx["retriever"]

    # the splice dropped the STARTUP text-side closure: letting a
    # video_key request consume it would resolve startup-row ids against
    # the spliced v_syn key table — well-formed but wrong names (review
    # r5). The guard error must answer instead.
    from test_serve_daemon import VAL_KEYS

    vk = serve_daemon._handle_request({"video_key": VAL_KEYS[0], "k": 1},
                                      ctx)
    assert "text side unavailable" in vk.get("error", ""), vk

    # the whole point: the daemon is now past the streaming threshold and
    # serving from the pre-chunked form
    assert N_ROWS >= STREAMING_GALLERY_MIN
    assert should_stream_topk(int(r.gallery.shape[0]))
    assert r._prepared is not None
    n_chunks0 = int(r._prepared.chunks.shape[0])

    sock_path = str(tmp_path / "scale.sock")
    ready = threading.Event()
    srv = threading.Thread(
        target=serve_daemon.serve_forever, args=(ctx, sock_path),
        kwargs={"ready_callback": ready.set}, daemon=True)
    srv.start()
    assert ready.wait(60)

    def client():
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(sock_path)
        return c, c.makefile("rwb")

    def ask(f, req):
        f.write((json.dumps(req) + "\n").encode())
        f.flush()
        return json.loads(f.readline())

    conn, f = client()
    try:
        texts = ["a man runs down the street", "a dog jumps",
                 "two people talk"]
        # warm + baseline: top-10 against the 40k streaming gallery
        base = {t: ask(f, {"query": t, "k": 10}) for t in texts}
        for t in texts:
            assert "error" not in base[t], base[t]
            assert len(base[t]["results"]) == 10
            ks = [h["key"] for h in base[t]["results"]]
            assert all(k.startswith("v_syn") for k in ks)

        # batched queries from concurrent connections merge through the
        # window batcher against the STREAMING path
        replies = [None] * 4
        def one(i):
            c2, f2 = client()
            with c2:
                replies[i] = ask(f2, {"query": texts[i % 3], "k": 5})
        ts = [threading.Thread(target=one, args=(i,)) for i in range(4)]
        [t.start() for t in ts]
        [t.join(timeout=120) for t in ts]
        for i, rep in enumerate(replies):
            assert rep is not None and "error" not in rep, rep
            assert ([h["key"] for h in rep["results"]] ==
                    [h["key"] for h in base[texts[i % 3]]["results"][:5]])

        # live ingest at scale: append_to_prepared extends the chunked
        # form in place (chunk count must not have drifted for 8 rows)
        a = ask(f, {"op": "add", "split": "val"})
        assert a.get("added") == 8, a
        assert a["gallery_rows"] >= N_ROWS + N_PAD + 8
        assert int(r._prepared.chunks.shape[0]) >= n_chunks0
        q = ask(f, {"query": "a man runs down the street", "k": 10})
        assert "error" not in q

        # threshold-crossing remove: 600/40108 > 1.2% -> auto-compaction
        # (the ONLINE path: plan off-lock, swap under it). Removed keys
        # are chosen disjoint from every baseline top-10 so the baseline
        # results must survive compaction bit-for-bit.
        protect = {h["key"] for t in texts for h in base[t]["results"]}
        victims = [k for k in ctx["keys"][:700]
                   if k.startswith("v_syn") and k not in protect][:600]
        assert len(victims) == 600
        rm = ask(f, {"op": "remove", "keys": victims})
        assert rm["removed"] == 600, rm
        assert "auto_compaction" in rm, rm
        assert rm["auto_compaction"]["compacted"] >= 600 + N_PAD
        assert r.invalid_fraction == 0.0
        assert should_stream_topk(int(r.gallery.shape[0]))  # still streaming

        # post-compaction: identical (key, score) results on the rebuilt
        # chunked forms — row indices moved, nothing observable did
        for t in texts:
            again = ask(f, {"query": t, "k": 10})
            assert again["results"] == base[t]["results"], t

        st = ask(f, {"op": "stats"})
        assert st["compactions"] == 1
        assert st["valid_rows"] == N_ROWS + 8 - 600
        assert st["prepared"] is True

        assert ask(f, {"op": "shutdown"}) == {"ok": True}
    finally:
        conn.close()
    srv.join(timeout=30)
    assert not srv.is_alive()
