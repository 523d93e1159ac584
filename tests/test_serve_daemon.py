"""cmhse-serve: the machine-client serving daemon (JSON lines over a unix
socket) must answer text and video queries, batch, report stats, survive
bad requests, and shut down cleanly — against a reference-layout data dir.
"""

import json
import socket
import threading

import jax
import numpy as np
import pytest

from reference_layout import write_reference_dataset

from cmhse_tpu.config import DataConfig, ExperimentConfig, ModelConfig
from cmhse_tpu.data import PrecompDataset, batches_from_dataset
from cmhse_tpu.data.vocab import build_vocab
from cmhse_tpu.train import create_train_state
from cmhse_tpu.train.checkpoint import CheckpointManager
from cmhse_tpu.cli import serve_daemon

FEAT = 8
VAL_KEYS = [f"v_val{i:03d}" for i in range(8)]


def _fixture_run(tmp_path_factory, tag: str, n_train: int = 6):
    """Reference-layout data dir + saved checkpoint for daemon tests;
    returns (root, ckpt_dir)."""
    root = tmp_path_factory.mktemp(f"servedata_{tag}")
    write_reference_dataset(str(root), n_train=n_train, n_val=8,
                            feat_dim=FEAT)
    caps = json.load(open(root / "train_captions.json"))
    vocab = build_vocab(
        [s for c in caps.values() for s in c["sentences"]], threshold=1)
    vocab.save(str(root / "vocab.json"))
    cfg = ExperimentConfig(
        data=DataConfig(data_path=str(root), batch_size=4, feat_dim=FEAT,
                        vocab_size=len(vocab) + 8, max_clips=3, max_frames=6,
                        max_sentences=3, max_words=8),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=FEAT,
                          rnn_hidden=16),
    )
    ds = PrecompDataset(str(root), "val", vocab, feat_dim=FEAT)
    b0 = next(iter(batches_from_dataset(ds, cfg.data, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), b0)
    ckpt_dir = str(tmp_path_factory.mktemp(f"serveckpt_{tag}"))
    mgr = CheckpointManager(ckpt_dir, cfg)
    mgr.save(state, epoch=0, best_rsum=0.0, is_best=True)
    mgr.close()
    return root, ckpt_dir


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    root, ckpt_dir = _fixture_run(tmp_path_factory, "main")
    return serve_daemon.build_context(ckpt_dir, str(root), "val")


def test_handle_request_directly(ctx):
    """The socket-free request handler: every op, error path, and result
    shape."""
    # single text query
    r = serve_daemon._handle_request({"query": "a man runs", "k": 3,
                                      "id": 7}, ctx)
    assert r["id"] == 7 and "error" not in r
    assert len(r["results"]) == 3 and r["latency_ms"] > 0
    keys = [hit["key"] for hit in r["results"]]
    assert set(keys) <= set(VAL_KEYS)
    scores = [hit["score"] for hit in r["results"]]
    assert scores == sorted(scores, reverse=True)

    # batched list query -> list of rows
    r = serve_daemon._handle_request(
        {"query": ["a man runs", "a dog jumps"], "k": 2}, ctx)
    assert len(r["results"]) == 2 and len(r["results"][0]) == 2

    # video->paragraph (text-side gallery built lazily on first use)
    assert ctx["retriever_text"] is None
    r = serve_daemon._handle_request({"video_key": VAL_KEYS[0], "k": 2}, ctx)
    assert ctx["retriever_text"] is not None
    assert len(r["results"]) == 2
    assert set(h["key"] for h in r["results"]) <= set(VAL_KEYS)

    # stats (with latency quantiles over the served queries)
    r = serve_daemon._handle_request({"op": "stats"}, ctx)
    assert r["valid_rows"] == 8 and r["requests_served"] >= 3
    assert r["side"] == "video" and r["split"] == "val"
    assert r["latency_ms_p50"] > 0 and r["latency_ms_p99"] >= r["latency_ms_p50"]

    # live removal: the tombstoned video vanishes from BOTH directions
    top = serve_daemon._handle_request({"query": "a man runs", "k": 1},
                                       ctx)["results"][0]["key"]
    r = serve_daemon._handle_request({"op": "remove", "keys": [top]}, ctx)
    assert r["removed"] == 1 and r["valid_rows"] == 7
    after = serve_daemon._handle_request({"query": "a man runs", "k": 7},
                                         ctx)
    assert top not in {h["key"] for h in after["results"]}
    v2p = serve_daemon._handle_request({"video_key": VAL_KEYS[1], "k": 7},
                                       ctx)
    assert top not in {h["key"] for h in v2p["results"]}
    assert "error" in serve_daemon._handle_request(
        {"op": "remove", "keys": []}, ctx)

    # errors keep the daemon alive
    assert "error" in serve_daemon._handle_request({"k": 3}, ctx)
    assert "error" in serve_daemon._handle_request(
        {"video_key": "nope"}, ctx)
    assert "error" in serve_daemon._handle_request({"query": ""}, ctx)
    assert "error" in serve_daemon._handle_request(
        {"query": "x", "k": 0}, ctx)
    assert "error" in serve_daemon._handle_request("not a dict", ctx)


def test_daemon_over_unix_socket(ctx, tmp_path):
    """End-to-end over a real AF_UNIX socket: queries from two sequential
    client connections, then a clean shutdown."""
    ctx["shutdown"] = False
    sock_path = str(tmp_path / "cmhse.sock")
    ready = threading.Event()
    t = threading.Thread(
        target=serve_daemon.serve_forever,
        args=(ctx, sock_path),
        kwargs={"ready_callback": ready.set},
        daemon=True,
    )
    t.start()
    assert ready.wait(30)

    def ask(lines):
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(sock_path)
        out = []
        with c, c.makefile("rwb") as f:
            for line in lines:
                f.write((json.dumps(line) if not isinstance(line, str)
                         else line).encode() + b"\n")
                f.flush()
                out.append(json.loads(f.readline()))
        return out

    # connection 1: a query, a malformed line, another query
    r1, r2, r3 = ask([
        {"query": "a man runs fast", "k": 2, "id": "a"},
        "{not json",
        {"op": "stats"},
    ])
    assert r1["id"] == "a" and len(r1["results"]) == 2
    assert "bad JSON" in r2["error"]
    # 7: the handler test above tombstoned one video in this shared ctx
    assert r3["valid_rows"] == 7

    # a client that fires a request and vanishes without reading the reply
    # must not kill the daemon (BrokenPipe on the server's write side)
    rude = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    rude.connect(sock_path)
    rude.sendall(json.dumps({"query": "a man runs", "k": 1}).encode() + b"\n")
    rude.close()

    # connection 2 (the daemon outlives connections AND clients): shutdown
    (r4, r5) = ask([{"query": "a dog jumps", "k": 1},
                    {"op": "shutdown"}])
    assert len(r4["results"]) == 1
    assert r5 == {"ok": True}
    t.join(timeout=30)
    assert not t.is_alive()


def test_handler_sharded_context(tmp_path_factory):
    """build_context(sharded=True): the daemon serves through the mesh
    (sharded_sim_topk) — same handler contract on the 8-device CPU mesh."""
    root = tmp_path_factory.mktemp("servedata_sh")
    write_reference_dataset(str(root), n_train=6, n_val=8, feat_dim=FEAT)
    caps = json.load(open(root / "train_captions.json"))
    vocab = build_vocab(
        [s for c in caps.values() for s in c["sentences"]], threshold=1)
    vocab.save(str(root / "vocab.json"))
    cfg = ExperimentConfig(
        data=DataConfig(data_path=str(root), batch_size=4, feat_dim=FEAT,
                        vocab_size=len(vocab) + 8, max_clips=3, max_frames=6,
                        max_sentences=3, max_words=8),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=FEAT,
                          rnn_hidden=16),
    )
    ds = PrecompDataset(str(root), "val", vocab, feat_dim=FEAT)
    b0 = next(iter(batches_from_dataset(ds, cfg.data, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), b0)
    ckpt_dir = str(tmp_path_factory.mktemp("serveckpt_sh"))
    mgr = CheckpointManager(ckpt_dir, cfg)
    mgr.save(state, epoch=0, best_rsum=0.0, is_best=True)
    mgr.close()

    sctx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      sharded=True, allow_any_path=True)
    assert sctx["retriever"].mesh is not None
    r = serve_daemon._handle_request({"query": "a man runs", "k": 3}, sctx)
    assert "error" not in r and len(r["results"]) == 3
    assert set(h["key"] for h in r["results"]) <= set(VAL_KEYS)

    # a removal BEFORE the text side's lazy build must not be resurrected
    # when a later video query constructs it from the startup encode
    gone = r["results"][0]["key"]
    assert serve_daemon._handle_request(
        {"op": "remove", "keys": [gone]}, sctx)["removed"] == 1
    assert sctx["retriever_text"] is None
    v2p = serve_daemon._handle_request(
        {"video_key": VAL_KEYS[1], "k": 7}, sctx)
    assert gone not in {h["key"] for h in v2p["results"]}

    # live ingest through the SHARDED handler: appends rebuild the
    # per-shard serving form (mesh galleries re-balance rows); added items
    # surface in both directions and are queryable by key
    root2 = tmp_path_factory.mktemp("servedata_sh2")
    write_reference_dataset(str(root2), feat_dim=FEAT, seed=11,
                            splits=[("live", 3)])
    r = serve_daemon._handle_request(
        {"op": "add", "split": "live", "data_path": str(root2)}, sctx)
    assert "error" not in r and r["added"] == 3
    hits = serve_daemon._handle_request({"query": "a man runs", "k": 10},
                                        sctx)["results"]
    assert any(h["key"].startswith("v_live") for h in hits)
    v2p2 = serve_daemon._handle_request({"video_key": "v_live000", "k": 3},
                                        sctx)
    assert "error" not in v2p2 and len(v2p2["results"]) == 3


def test_handler_flat_model(tmp_path_factory):
    """A FLAT (non-hierarchical, config-1 lineage) checkpoint serves too:
    build_context reads hierarchical=False from config.json, loads the
    dataset in flat mode (whole video = one clip, whole paragraph = one
    sentence), and every op works against it."""
    root = tmp_path_factory.mktemp("servedata_flat")
    write_reference_dataset(str(root), n_train=5, n_val=8, feat_dim=FEAT)
    caps = json.load(open(root / "train_captions.json"))
    vocab = build_vocab(
        [s for c in caps.values() for s in c["sentences"]], threshold=1)
    vocab.save(str(root / "vocab.json"))
    cfg = ExperimentConfig(
        data=DataConfig(data_path=str(root), batch_size=4, feat_dim=FEAT,
                        vocab_size=len(vocab) + 8, max_clips=1,
                        max_frames=18, max_sentences=1, max_words=24),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=FEAT,
                          rnn_hidden=16, hierarchical=False),
    )
    ds = PrecompDataset(str(root), "val", vocab, feat_dim=FEAT, flat=True)
    b0 = next(iter(batches_from_dataset(ds, cfg.data, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), b0)
    ckpt_dir = str(tmp_path_factory.mktemp("serveckpt_flat"))
    mgr = CheckpointManager(ckpt_dir, cfg)
    mgr.save(state, epoch=0, best_rsum=0.0, is_best=True)
    mgr.close()
    fctx = serve_daemon.build_context(ckpt_dir, str(root), "val")

    r = serve_daemon._handle_request({"query": "a man runs", "k": 3}, fctx)
    assert "error" not in r and len(r["results"]) == 3
    assert set(h["key"] for h in r["results"]) <= set(VAL_KEYS)
    v2p = serve_daemon._handle_request({"video_key": VAL_KEYS[0], "k": 2},
                                       fctx)
    assert "error" not in v2p and len(v2p["results"]) == 2
    # live ingest opens the added split in flat mode as well
    a = serve_daemon._handle_request({"op": "add", "split": "train"}, fctx)
    assert "error" not in a and a["added"] == 5
    hits = serve_daemon._handle_request({"query": "a man runs", "k": 13},
                                        fctx)["results"]
    assert any(h["key"].startswith("v_train") for h in hits)


def test_daemon_over_tcp(ctx):
    """Same protocol over TCP (remote machine clients): ephemeral-port
    bind, one query, stats, shutdown."""
    ctx["shutdown"] = False
    ready = threading.Event()
    t = threading.Thread(
        target=serve_daemon.serve_forever,
        args=(ctx,),
        kwargs={"tcp": ("127.0.0.1", 0), "ready_callback": ready.set},
        daemon=True,
    )
    t.start()
    assert ready.wait(30)
    host, port = ctx["listening_on"].rsplit(":", 1)
    c = socket.create_connection((host, int(port)), timeout=30)
    out = []
    with c, c.makefile("rwb") as f:
        for req in ({"query": "a man runs fast", "k": 2, "id": "t"},
                    {"op": "stats"}, {"op": "shutdown"}):
            f.write(json.dumps(req).encode() + b"\n")
            f.flush()
            out.append(json.loads(f.readline()))
    r1, r2, r3 = out
    assert r1["id"] == "t" and len(r1["results"]) == 2
    assert r2["valid_rows"] >= 1 and r3 == {"ok": True}
    t.join(timeout=30)
    assert not t.is_alive()


def test_idle_client_does_not_block_others(ctx):
    """Thread-per-connection: a client that connects and sends NOTHING must
    not starve other clients, and shutdown must complete while the idle
    connection is still open (its read side is dropped at exit)."""
    ctx["shutdown"] = False
    ready = threading.Event()
    t = threading.Thread(
        target=serve_daemon.serve_forever,
        args=(ctx,),
        kwargs={"tcp": ("127.0.0.1", 0), "ready_callback": ready.set},
        daemon=True,
    )
    t.start()
    assert ready.wait(30)
    host, port = ctx["listening_on"].rsplit(":", 1)
    idle = socket.create_connection((host, int(port)), timeout=30)
    busy = socket.create_connection((host, int(port)), timeout=30)
    with busy, busy.makefile("rwb") as f:
        for req in ({"query": "a man runs fast", "k": 2},
                    {"op": "shutdown"}):
            f.write(json.dumps(req).encode() + b"\n")
            f.flush()
            out = json.loads(f.readline())
        assert out == {"ok": True}
    t.join(timeout=30)
    assert not t.is_alive()
    # the daemon dropped the idle connection's read side on exit: the
    # client sees EOF rather than hanging forever
    idle.settimeout(10)
    assert idle.recv(1) == b""
    idle.close()


def test_oversized_request_line_is_refused(ctx):
    """A >MAX_LINE_BYTES request line (runaway or malicious client on a
    TCP listener) gets an error reply and a hangup — bounded memory — and
    the daemon keeps serving new connections."""
    ctx["shutdown"] = False
    ready = threading.Event()
    t = threading.Thread(
        target=serve_daemon.serve_forever,
        args=(ctx,),
        kwargs={"tcp": ("127.0.0.1", 0), "ready_callback": ready.set},
        daemon=True,
    )
    t.start()
    assert ready.wait(30)
    host, port = ctx["listening_on"].rsplit(":", 1)
    c = socket.create_connection((host, int(port)), timeout=30)
    with c, c.makefile("rwb") as f:
        # 4x the cap: the server reads a PARTIAL first chunk, replies,
        # drains the tail, and hangs up — without the drain the reply
        # would be destroyed by a TCP reset (unread bytes at close)
        f.write(b'{"query": "'
                + b"x" * (4 * serve_daemon.MAX_LINE_BYTES) + b'"}\n')
        f.flush()
        r = json.loads(f.readline())
        assert "exceeds" in r["error"]
        assert f.readline() == b""  # connection dropped after the reply
    # a barely-oversized line that arrives COMPLETE (readline's cap
    # overshoots by up to a buffer chunk) must not leave the drain loop
    # blocking on data that will never come
    cb = socket.create_connection((host, int(port)), timeout=30)
    with cb, cb.makefile("rwb") as fb:
        fb.write(b'{"query": "'
                 + b"x" * serve_daemon.MAX_LINE_BYTES + b'"}\n')
        fb.flush()
        r = json.loads(fb.readline())
        assert "exceeds" in r["error"]
        assert fb.readline() == b""
    c2 = socket.create_connection((host, int(port)), timeout=30)
    with c2, c2.makefile("rwb") as f2:
        f2.write(b'{"op": "shutdown"}\n')
        f2.flush()
        assert json.loads(f2.readline()) == {"ok": True}
    t.join(timeout=30)
    assert not t.is_alive()


def test_cli_warm_flag(tmp_path, monkeypatch):
    """--warm issues one throwaway request per direction before the accept
    loop (lazy text-side build + jit both paths) and resets the stats."""
    import types
    from collections import deque

    warm_reqs = []
    fake_ctx = {"dataset": types.SimpleNamespace(keys=["vid0"]),
                "served": 7, "latencies": deque([3.3])}
    monkeypatch.setattr(serve_daemon, "build_context",
                        lambda *a, **kw: fake_ctx)
    monkeypatch.setattr(serve_daemon, "_handle_request",
                        lambda req, c: (warm_reqs.append(req), {})[1])
    monkeypatch.setattr(
        serve_daemon, "serve_forever",
        lambda c, s=None, ready_callback=None, tcp=None, server=None,
        max_connections=None: server.close())
    rc = serve_daemon.main(["ckpt", "--socket", str(tmp_path / "w.sock"),
                            "--warm", "--platform", "cpu"])
    assert rc == 0
    assert "query" in warm_reqs[0] and warm_reqs[1]["video_key"] == "vid0"
    assert fake_ctx["served"] == 0 and len(fake_ctx["latencies"]) == 0


def test_serve_client(ctx, tmp_path):
    """ServeClient speaks the full protocol over TCP and unix sockets:
    queries (single + batched), video queries, remove, stats, error
    surfacing (ServeError), shutdown, and hung-up detection."""
    from cmhse_tpu.client import ServeClient, ServeError

    ctx["shutdown"] = False
    ready = threading.Event()
    t = threading.Thread(
        target=serve_daemon.serve_forever, args=(ctx,),
        kwargs={"tcp": ("127.0.0.1", 0), "ready_callback": ready.set},
        daemon=True)
    t.start()
    assert ready.wait(30)
    host, port = ctx["listening_on"].rsplit(":", 1)
    with ServeClient(tcp=(host, int(port)), timeout=120) as c:
        hits = c.query("a man runs", k=3)
        assert len(hits) == 3 and hits[0]["score"] >= hits[-1]["score"]
        rows = c.query(["a man runs", "a dog jumps"], k=2)
        assert len(rows) == 2 and len(rows[0]) == 2
        assert len(c.query_video(VAL_KEYS[0], k=2)) == 2
        with pytest.raises(ServeError, match="not in the"):
            c.query_video("nope")
        assert c.stats()["valid_rows"] >= 1
        assert c.remove(["definitely-not-a-key"]) == 0
        c.shutdown()
        with pytest.raises((ConnectionError, OSError)):
            c.query("after shutdown")
    t.join(timeout=30)
    assert not t.is_alive()

    # unix-socket flavor of the same client
    ctx["shutdown"] = False
    sock = str(tmp_path / "client.sock")
    ready2 = threading.Event()
    t2 = threading.Thread(
        target=serve_daemon.serve_forever, args=(ctx, sock),
        kwargs={"ready_callback": ready2.set}, daemon=True)
    t2.start()
    assert ready2.wait(30)
    with ServeClient(socket_path=sock, timeout=120) as c:
        assert len(c.query("a man runs", k=1)) == 1
        c.shutdown()
    t2.join(timeout=30)
    assert not t2.is_alive()

    with pytest.raises(ValueError):
        ServeClient()


def test_gallery_cache(tmp_path_factory, tmp_path, monkeypatch):
    """--gallery_cache: the second startup reuses the persisted encode
    (proved by making re-encoding fail loudly), results are identical
    through both directions, and touching a split input invalidates it."""
    import os
    import time

    import cmhse_tpu.eval.encode as enc_mod

    root, ckpt_dir = _fixture_run(tmp_path_factory, "cache")
    cache = str(tmp_path / "gallery.npz")
    q = {"query": "a man runs", "k": 3}

    ctx1 = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      gallery_cache=cache)
    r1 = serve_daemon._handle_request(q, ctx1)
    v1 = serve_daemon._handle_request({"video_key": "v_val000", "k": 3},
                                      ctx1)
    assert os.path.exists(cache)

    with monkeypatch.context() as m:
        m.setattr(enc_mod, "encode_gallery_device",
                  lambda *a, **k: pytest.fail("re-encoded a fresh cache"))
        ctx2 = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                          gallery_cache=cache)
        r2 = serve_daemon._handle_request(q, ctx2)
        # the lazily-built text side comes from the cached tuple too
        v2 = serve_daemon._handle_request(
            {"video_key": "v_val000", "k": 3}, ctx2)
    assert r1["results"] == r2["results"]
    assert v1["results"] == v2["results"]
    # the cache-hit gallery must be DEVICE-resident for every dtype: a
    # host numpy gallery re-transfers to device on every query (review r5
    # — the f32 hit path used to serve slower than a fresh encode)
    import jax

    assert isinstance(ctx2["retriever"].gallery, jax.Array)
    assert isinstance(ctx2["retriever_text"].gallery, jax.Array)

    # touching a split input invalidates the fingerprint -> re-encode
    caps = os.path.join(str(root), "val_captions.json")
    later = time.time() + 30
    os.utime(caps, (later, later))
    ctx3 = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      gallery_cache=cache)
    assert serve_daemon._handle_request(q, ctx3)["results"] == r1["results"]

    # a corrupt cache file must re-encode, not block startup
    with open(cache, "wb") as f:
        f.write(b"not an npz")
    ctx4 = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      gallery_cache=cache)
    assert serve_daemon._handle_request(q, ctx4)["results"] == r1["results"]


def test_daemon_access_log(ctx, tmp_path):
    """--log_jsonl's logger: one record per wire request, op-tagged, with
    ok/latency/error fields — written from the client threads."""
    from cmhse_tpu.utils.logging import JsonlLogger

    ctx["shutdown"] = False
    log_path = str(tmp_path / "serve_log.jsonl")
    ctx["logger"] = JsonlLogger(log_path, tensorboard=False)
    try:
        ready = threading.Event()
        t = threading.Thread(
            target=serve_daemon.serve_forever, args=(ctx,),
            kwargs={"tcp": ("127.0.0.1", 0), "ready_callback": ready.set},
            daemon=True)
        t.start()
        assert ready.wait(30)
        host, port = ctx["listening_on"].rsplit(":", 1)
        c = socket.create_connection((host, int(port)), timeout=30)
        with c, c.makefile("rwb") as f:
            for raw in (json.dumps({"query": "a man runs", "k": 2}),
                        "this is not json",
                        json.dumps({"video_key": "nope"}),
                        json.dumps({"op": "shutdown"})):
                f.write(raw.encode() + b"\n")
                f.flush()
                f.readline()
        t.join(timeout=30)
        assert not t.is_alive()
    finally:
        ctx.pop("logger").close()  # module-scoped ctx: don't leak the logger
    recs = [json.loads(line) for line in open(log_path)]
    assert [r["op"] for r in recs] == ["query", "bad_json", "video_key",
                                       "shutdown"]
    assert all(r["event"] == "serve_request" for r in recs)
    assert recs[0]["ok"] and recs[0]["latency_ms"] > 0
    assert not recs[1]["ok"] and "bad JSON" in recs[1]["error"]
    assert not recs[2]["ok"] and "not in the" in recs[2]["error"]
    assert recs[3]["ok"]


def test_retrieve_connect_mode(ctx, capsys):
    """cmhse-retrieve --connect: the CLI queries a RUNNING daemon through
    ServeClient — no checkpoint load, no gallery encode — and refuses
    daemon-side gallery flags."""
    from cmhse_tpu.cli import retrieve as retrieve_cli

    ctx["shutdown"] = False
    ready = threading.Event()
    t = threading.Thread(
        target=serve_daemon.serve_forever, args=(ctx,),
        kwargs={"tcp": ("127.0.0.1", 0), "ready_callback": ready.set},
        daemon=True)
    t.start()
    assert ready.wait(30)
    addr = ctx["listening_on"]
    rc = retrieve_cli.main(["--connect", addr, "--query", "a man runs",
                            "--query_video", VAL_KEYS[0], "-k", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "query: 'a man runs'" in out
    assert f"video query: {VAL_KEYS[0]!r}" in out
    assert out.count("score=") == 4  # two hits per direction

    # gallery-shape flags belong to the daemon, not the connecting client
    with pytest.raises(SystemExit):
        retrieve_cli.main(["--connect", addr, "--query", "x", "--sharded"])
    # an unknown video key comes back as a clean error, not a traceback
    with pytest.raises(SystemExit, match="daemon refused"):
        retrieve_cli.main(["--connect", addr, "--query_video", "nope"])
    # without --connect the checkpoint argument is still required
    with pytest.raises(SystemExit):
        retrieve_cli.main(["--query", "x"])

    from cmhse_tpu.client import ServeClient

    host, port = addr.rsplit(":", 1)
    with ServeClient(tcp=(host, int(port))) as c:
        c.shutdown()
    t.join(timeout=30)
    assert not t.is_alive()


def test_serve_client_import_needs_no_jax():
    """The client must be usable on machines where jax isn't installed
    (this image pre-imports jax via sitecustomize, so simulate: purge it
    from sys.modules and BLOCK re-imports, then import the client)."""
    import subprocess
    import sys

    code = """
import sys
class _BlockJax:
    def find_spec(self, name, path=None, target=None):
        if name == "jax" or name.startswith(("jax.", "jaxlib")):
            raise ImportError(f"client import pulled in {name}")
        return None
sys.meta_path.insert(0, _BlockJax())
for m in [m for m in list(sys.modules)
          if m == "jax" or m.startswith(("jax.", "jaxlib"))]:
    del sys.modules[m]
from cmhse_tpu.client import ServeClient, ServeError  # noqa: F401
print("jax-free import ok")
"""
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "jax-free import ok" in r.stdout


def test_serve_forever_rejects_ambiguous_bind(ctx):
    with pytest.raises(ValueError):
        serve_daemon.serve_forever(ctx, "/tmp/x.sock",
                                   tcp=("127.0.0.1", 0))
    with pytest.raises(ValueError):
        serve_daemon.serve_forever(ctx)


def test_cli_main_wires_flags(ctx, tmp_path, monkeypatch):
    """cmhse-serve main(): binds the listener BEFORE the (expensive)
    context build, then enters the accept loop (patched out — the loop
    itself is tested above)."""
    calls = {}

    def fake_serve(c, s=None, ready_callback=None, tcp=None, server=None,
                   max_connections=None):
        calls.update(ctx=c, sock=s, tcp=tcp, server=server)
        server.close()

    monkeypatch.setattr(serve_daemon, "build_context",
                        lambda *a, **kw: {"built": (a, kw)})
    monkeypatch.setattr(serve_daemon, "serve_forever", fake_serve)
    rc = serve_daemon.main(["ckpt_dir", "--socket", str(tmp_path / "s.sock"),
                            "--data_path", "dp", "--split", "val",
                            "--quantized", "--platform", "cpu"])
    assert rc == 0
    assert calls["sock"].endswith("s.sock") and calls["tcp"] is None
    assert calls["server"] is not None  # pre-bound, handed through
    a, kw = calls["ctx"]["built"]
    assert a == ("ckpt_dir", "dp", "val")
    assert kw["quantized"] is True and kw["sharded"] is False

    # --tcp routes the parsed (host, port) pair; --socket stays None
    rc = serve_daemon.main(["ckpt_dir", "--tcp", "127.0.0.1:0",
                            "--data_path", "dp", "--platform", "cpu"])
    assert rc == 0
    assert calls["sock"] is None and calls["tcp"] == ("127.0.0.1", 0)

    # a taken unix path fails in main (clean argparse error), BEFORE
    # build_context gets to spend minutes encoding
    monkeypatch.setattr(serve_daemon, "build_context",
                        lambda *a, **kw: pytest.fail("must not build"))
    sock_path = str(tmp_path / "live.sock")
    held = serve_daemon._bind_unix(sock_path)
    held.listen(1)  # a LIVE daemon on the path (not a stale file)
    try:
        with pytest.raises(SystemExit):
            serve_daemon.main(["ckpt_dir", "--socket", sock_path,
                               "--platform", "cpu"])
    finally:
        held.close()

    # exactly one of --socket/--tcp, HOST:PORT must parse, IPv4 only
    for argv in (["ckpt_dir"],
                 ["ckpt_dir", "--socket", "s", "--tcp", "h:1"],
                 ["ckpt_dir", "--tcp", "noport"],
                 ["ckpt_dir", "--tcp", "[::1]:7700"]):
        with pytest.raises(SystemExit):
            serve_daemon.main(argv)


def test_live_add_op(tmp_path_factory):
    """Live gallery ingest over the wire ({"op": "add"}): a
    reference-layout split lands on disk after startup and the daemon
    encodes+appends it — items become retrievable in BOTH directions
    (including through the lazily-built text side), duplicates are
    refused, and removal of an added item works like any other."""
    root = tmp_path_factory.mktemp("servedata_add")
    write_reference_dataset(str(root), n_train=5, n_val=8, feat_dim=FEAT)
    caps = json.load(open(root / "train_captions.json"))
    vocab = build_vocab(
        [s for c in caps.values() for s in c["sentences"]], threshold=1)
    vocab.save(str(root / "vocab.json"))
    cfg = ExperimentConfig(
        data=DataConfig(data_path=str(root), batch_size=4, feat_dim=FEAT,
                        vocab_size=len(vocab) + 8, max_clips=3, max_frames=6,
                        max_sentences=3, max_words=8),
        model=ModelConfig(embed_size=16, word_dim=8, feat_dim=FEAT,
                          rnn_hidden=16),
    )
    ds = PrecompDataset(str(root), "val", vocab, feat_dim=FEAT)
    b0 = next(iter(batches_from_dataset(ds, cfg.data, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), b0)
    ckpt_dir = str(tmp_path_factory.mktemp("serveckpt_add"))
    mgr = CheckpointManager(ckpt_dir, cfg)
    mgr.save(state, epoch=0, best_rsum=0.0, is_best=True)
    mgr.close()
    actx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      allow_any_path=True)

    def handle(req):
        return serve_daemon._handle_request(req, actx)

    # ingest the sibling "train" split (distinct keys) BEFORE the text
    # side's lazy build exists
    r = handle({"op": "add", "split": "train"})
    assert "error" not in r and r["added"] == 5
    assert r["valid_rows"] == 13
    # added items surface in text->video retrieval
    hit_keys = {h["key"]
                for h in handle({"query": "a man runs", "k": 13})["results"]}
    assert {f"v_train{i:03d}" for i in range(5)} <= hit_keys

    # duplicates and bogus splits are refused, gallery untouched
    assert "already in the gallery" in handle(
        {"op": "add", "split": "train"})["error"]
    assert "error" in handle({"op": "add", "split": "nosuch"})
    assert "error" in handle({"op": "add"})
    assert handle({"op": "stats"})["valid_rows"] == 13

    # the lazy text side replays the add: a val video finds train
    # paragraphs among its candidates
    v2p = handle({"video_key": "v_val000", "k": 13})
    assert any(k.startswith("v_train")
               for k in {h["key"] for h in v2p["results"]})

    # a live-added video is itself usable as a v2p QUERY (its features
    # resolve through the added split's dataset, not just the startup one)
    v2p_added = handle({"video_key": "v_train001", "k": 3})
    assert "error" not in v2p_added and len(v2p_added["results"]) == 3

    # removing an added item tombstones it in BOTH directions
    assert handle({"op": "remove", "keys": ["v_train002"]})["removed"] == 1
    assert "v_train002" not in {
        h["key"] for h in handle({"query": "a man runs", "k": 12})["results"]}
    assert "v_train002" not in {
        h["key"] for h in handle({"video_key": "v_val000", "k": 12})["results"]}

    # a second ingest AFTER the text side exists updates both directly
    root2 = tmp_path_factory.mktemp("servedata_add2")
    write_reference_dataset(str(root2), feat_dim=FEAT, seed=3,
                            splits=[("batch2", 3)])
    r2 = handle({"op": "add", "split": "batch2", "data_path": str(root2)})
    assert "error" not in r2 and r2["added"] == 3 and r2["valid_rows"] == 15
    assert "v_batch2000" in {
        h["key"] for h in handle({"query": "a man runs", "k": 15})["results"]}
    assert "v_batch2000" in {
        h["key"]
        for h in handle({"video_key": "v_val000", "k": 15})["results"]}
    # ...and the second batch's videos are queryable by key too, from a
    # split that lives under a DIFFERENT data_path than the startup one
    assert "error" not in handle({"video_key": "v_batch2001", "k": 2})

    # the replay ledger was consumed (and freed) by the lazy text-side
    # build — later adds went straight to both retrievers
    assert actx["added"] == []

    # removed keys are RE-ADDABLE (a corrected split re-ingested): remove
    # all of batch2, re-add it, and the names resolve to the new rows
    assert handle({"op": "remove",
                   "keys": [f"v_batch2{i:03d}"
                            for i in range(3)]})["removed"] == 3
    r3 = handle({"op": "add", "split": "batch2", "data_path": str(root2)})
    assert "error" not in r3 and r3["added"] == 3
    assert r3["valid_rows"] == 15
    assert "v_batch2000" in {
        h["key"] for h in handle({"query": "a man runs", "k": 15})["results"]}
    # the revived name is a duplicate again...
    assert "already in the gallery" in handle(
        {"op": "add", "split": "batch2", "data_path": str(root2)})["error"]
    # ...and removing it tombstones the NEW row (the live one)
    assert handle({"op": "remove", "keys": ["v_batch2000"]})["removed"] == 1
    assert "v_batch2000" not in {
        h["key"] for h in handle({"query": "a man runs", "k": 14})["results"]}


def test_nearest_rank_quantiles():
    """Nearest-rank percentile (VERDICT r3 weak 6): the ceil(p*n)-th
    smallest, 1-based — not the old biased int(p*n) index."""
    vals = list(range(1, 101))  # 1..100
    assert serve_daemon._nearest_rank(vals, 0.50) == 50
    assert serve_daemon._nearest_rank(vals, 0.90) == 90
    assert serve_daemon._nearest_rank(vals, 0.99) == 99
    assert serve_daemon._nearest_rank(vals, 1.00) == 100
    assert serve_daemon._nearest_rank([7.5], 0.5) == 7.5
    assert serve_daemon._nearest_rank([1, 2], 0.99) == 2


def test_auth_token(tmp_path_factory, tmp_path):
    """--auth_token: every op is refused without the exact token (no side
    effects), accepted with it — end to end through ServeClient(token=)."""
    root, ckpt_dir = _fixture_run(tmp_path_factory, "auth")
    actx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      auth_token="sekrit")

    # every unauthorized shape: missing, wrong, non-string token
    for req in ({"op": "shutdown"},
                {"op": "shutdown", "token": "wrong"},
                {"op": "shutdown", "token": 42},
                {"op": "remove", "keys": [VAL_KEYS[0]]},
                {"op": "add", "split": "train"},
                {"op": "compact"},
                {"op": "stats"},
                {"query": "a man runs", "k": 1}):
        r = serve_daemon._handle_request(req, actx)
        assert "unauthorized" in r.get("error", ""), (req, r)
    assert actx["shutdown"] is False          # no side effects
    assert actx["retriever"].n_valid == 8

    # authorized requests work (and the token field doesn't leak into
    # results handling)
    ok = serve_daemon._handle_request(
        {"query": "a man runs", "k": 2, "token": "sekrit"}, actx)
    assert "error" not in ok and len(ok["results"]) == 2
    assert serve_daemon._handle_request(
        {"op": "remove", "keys": [VAL_KEYS[0]], "token": "sekrit"},
        actx)["removed"] == 1

    # over the wire: ServeClient(token=...) attaches it everywhere
    from cmhse_tpu.client import ServeClient, ServeError

    actx["shutdown"] = False
    ready = threading.Event()
    t = threading.Thread(
        target=serve_daemon.serve_forever, args=(actx,),
        kwargs={"tcp": ("127.0.0.1", 0), "ready_callback": ready.set},
        daemon=True)
    t.start()
    assert ready.wait(30)
    host, port = actx["listening_on"].rsplit(":", 1)
    with ServeClient(tcp=(host, int(port)), timeout=120) as bad:
        with pytest.raises(ServeError, match="unauthorized"):
            bad.query("a man runs")
    with ServeClient(tcp=(host, int(port)), timeout=120,
                     token="sekrit") as good:
        assert len(good.query("a man runs", k=1)) == 1
        assert good.stats()["valid_rows"] == 7
        good.shutdown()
    t.join(timeout=30)
    assert not t.is_alive()


def test_add_data_path_confinement(tmp_path_factory):
    """{'op': 'add'} with a client-supplied data_path outside the startup
    root is refused (the daemon opens those files server-side); inside the
    root — or anywhere with --allow_any_path — it proceeds."""
    root, ckpt_dir = _fixture_run(tmp_path_factory, "confine")
    outside = tmp_path_factory.mktemp("outside_root")
    write_reference_dataset(str(outside), feat_dim=FEAT, seed=5,
                            splits=[("ext", 2)])
    # a split in a SUBDIRECTORY of the root is inside the confinement
    sub = root / "incoming"
    sub.mkdir()
    write_reference_dataset(str(sub), feat_dim=FEAT, seed=6,
                            splits=[("sub", 2)])

    cctx = serve_daemon.build_context(ckpt_dir, str(root), "val")
    r = serve_daemon._handle_request(
        {"op": "add", "split": "ext", "data_path": str(outside)}, cctx)
    assert "outside the startup data root" in r["error"]
    assert "--allow_any_path" in r["error"]
    assert cctx["retriever"].n_valid == 8  # nothing ingested

    r = serve_daemon._handle_request(
        {"op": "add", "split": "sub", "data_path": str(sub)}, cctx)
    assert "error" not in r and r["added"] == 2

    actx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      allow_any_path=True)
    r = serve_daemon._handle_request(
        {"op": "add", "split": "ext", "data_path": str(outside)}, actx)
    assert "error" not in r and r["added"] == 2


def test_add_encodes_outside_request_lock(tmp_path_factory):
    """The live-ingest ENCODE must not hold the request lock (VERDICT r3
    weak 1): queries on another connection complete while an add's encode
    is in flight, and the add still commits atomically afterwards."""
    import cmhse_tpu.eval.encode as enc_mod

    root, ckpt_dir = _fixture_run(tmp_path_factory, "nolock")
    root2 = tmp_path_factory.mktemp("nolock_add")
    write_reference_dataset(str(root2), feat_dim=FEAT, seed=9,
                            splits=[("slow", 2)])
    nctx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      allow_any_path=True)

    encode_started = threading.Event()
    release_encode = threading.Event()
    real_encode = enc_mod.encode_gallery_device

    def slow_encode(*a, **kw):
        out = real_encode(*a, **kw)
        encode_started.set()
        assert release_encode.wait(60), "test deadlock: never released"
        return out

    add_result = {}

    def run_add():
        # exactly what _client_loop does for an add: NO request lock held
        add_result["resp"] = serve_daemon._handle_request(
            {"op": "add", "split": "slow", "data_path": str(root2)}, nctx)

    enc_mod.encode_gallery_device = slow_encode
    try:
        t = threading.Thread(target=run_add, daemon=True)
        t.start()
        assert encode_started.wait(60)
        # the add is mid-encode; a query on "another connection" (request
        # lock held, as _client_loop does) must complete NOW — against the
        # OLD gallery
        with nctx["lock"]:
            q = serve_daemon._handle_request(
                {"query": "a man runs", "k": 8}, nctx)
        assert "error" not in q
        assert not any(h["key"].startswith("v_slow") for h in q["results"])
        release_encode.set()
        t.join(timeout=60)
        assert not t.is_alive()
    finally:
        enc_mod.encode_gallery_device = real_encode
        release_encode.set()
    assert add_result["resp"]["added"] == 2
    # same-connection add-then-query semantics unchanged: the new items
    # are immediately retrievable after the add returned
    with nctx["lock"]:
        q2 = serve_daemon._handle_request(
            {"query": "a man runs", "k": 10}, nctx)
    assert any(h["key"].startswith("v_slow") for h in q2["results"])


def test_concurrent_adds_serialize(tmp_path_factory):
    """Two adds racing from two connections both land (the ingest lock
    serializes them); the key table and galleries stay consistent."""
    root, ckpt_dir = _fixture_run(tmp_path_factory, "race")
    roots = []
    for i in range(2):
        rr = tmp_path_factory.mktemp(f"race_add{i}")
        write_reference_dataset(str(rr), feat_dim=FEAT, seed=20 + i,
                                splits=[(f"race{i}", 2)])
        roots.append(str(rr))
    rctx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      allow_any_path=True)
    results = [None, None]

    def add(i):
        results[i] = serve_daemon._handle_request(
            {"op": "add", "split": f"race{i}", "data_path": roots[i]}, rctx)

    ts = [threading.Thread(target=add, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]
    assert all(r is not None and "error" not in r for r in results), results
    assert rctx["retriever"].n_valid == 12
    assert len(rctx["keys"]) == 12
    with rctx["lock"]:
        q = serve_daemon._handle_request({"query": "a man runs", "k": 12},
                                         rctx)
    got = {h["key"] for h in q["results"]}
    assert {"v_race0000", "v_race0001", "v_race1000", "v_race1001"} <= got


def test_daemon_auto_compaction(tmp_path_factory):
    """Removes that push the invalid fraction past --compact_threshold
    trigger an in-place compaction of BOTH directions; names, results, and
    later ingest keep working; stats reports the fraction + count."""
    root, ckpt_dir = _fixture_run(tmp_path_factory, "compact")
    pctx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      compact_threshold=0.25)
    # build the text side up front so compaction must cover both
    serve_daemon._handle_request({"video_key": VAL_KEYS[0], "k": 1}, pctx)

    rows0 = int(pctx["retriever"].gallery.shape[0])
    r = serve_daemon._handle_request(
        {"op": "remove", "keys": VAL_KEYS[:3]}, pctx)
    assert r["removed"] == 3
    assert "auto_compaction" in r, r
    assert r["auto_compaction"]["compacted"] >= 3
    assert int(pctx["retriever"].gallery.shape[0]) == rows0 - 3 \
        or int(pctx["retriever"].gallery.shape[0]) == 5
    assert int(pctx["retriever_text"].gallery.shape[0]) == 5

    st = serve_daemon._handle_request({"op": "stats"}, pctx)
    assert st["compactions"] == 1 and st["invalid_fraction"] == 0.0
    assert st["gallery_rows"] == 5 and st["valid_rows"] == 5

    # the compacted gallery still serves correct names in both directions
    q = serve_daemon._handle_request({"query": "a man runs", "k": 5}, pctx)
    assert {h["key"] for h in q["results"]} == set(VAL_KEYS[3:])
    v = serve_daemon._handle_request({"video_key": VAL_KEYS[4], "k": 5},
                                     pctx)
    assert {h["key"] for h in v["results"]} == set(VAL_KEYS[3:])

    # manual {"op": "compact"} is the identity here (nothing invalid)
    r = serve_daemon._handle_request({"op": "compact"}, pctx)
    assert r["compacted"] == 0 and r["valid_rows"] == 5

    # removed names stay re-addable after compaction (fresh split reusing
    # a tombstoned-and-reclaimed name is the churn story)
    r = serve_daemon._handle_request({"op": "add", "split": "val"}, pctx)
    assert "already in the gallery" in r["error"]  # survivors still block


def test_compaction_rebuild_off_request_lock(tmp_path_factory):
    """A threshold-crossing remove's auto-compaction REBUILD must not
    stall other connections: while the (artificially slowed) plan phase is
    in flight, a query holding the request lock — exactly what
    _client_loop does for queries — completes against the
    tombstoned-but-correct old gallery (VERDICT r4 weak 2)."""
    from cmhse_tpu.eval import serve as serve_mod

    root, ckpt_dir = _fixture_run(tmp_path_factory, "oncompact")
    cctx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      compact_threshold=0.25)
    # build the text side up front so BOTH directions compact
    serve_daemon._handle_request({"video_key": VAL_KEYS[0], "k": 1}, cctx)

    plan_started = threading.Event()
    release_plan = threading.Event()
    real_plan = serve_mod.Retriever.plan_compaction

    def slow_plan(self):
        out = real_plan(self)
        plan_started.set()
        assert release_plan.wait(60), "test deadlock: never released"
        return out

    remove_result = {}

    def run_remove():
        # exactly what _client_loop does for a remove: NO lock held
        remove_result["resp"] = serve_daemon._handle_request(
            {"op": "remove", "keys": VAL_KEYS[:3]}, cctx)

    serve_mod.Retriever.plan_compaction = slow_plan
    try:
        t = threading.Thread(target=run_remove, daemon=True)
        t.start()
        assert plan_started.wait(60)
        # the compaction rebuild is mid-plan; a query on "another
        # connection" must complete NOW, with the removed keys already
        # invisible (tombstoned before the rebuild started)
        with cctx["lock"]:
            q = serve_daemon._handle_request(
                {"query": "a man runs", "k": 8}, cctx)
        assert "error" not in q
        got = {h["key"] for h in q["results"]}
        assert got == set(VAL_KEYS[3:])
        release_plan.set()
        t.join(timeout=60)
        assert not t.is_alive()
    finally:
        serve_mod.Retriever.plan_compaction = real_plan
        release_plan.set()

    r = remove_result["resp"]
    assert r["removed"] == 3
    assert r["auto_compaction"]["compacted"] >= 3
    assert int(cctx["retriever"].gallery.shape[0]) == 5
    assert int(cctx["retriever_text"].gallery.shape[0]) == 5
    st = serve_daemon._handle_request({"op": "stats"}, cctx)
    assert st["compactions"] == 1 and st["invalid_fraction"] == 0.0
    # both directions still serve correct names on the compacted forms
    q = serve_daemon._handle_request({"query": "a man runs", "k": 5}, cctx)
    assert {h["key"] for h in q["results"]} == set(VAL_KEYS[3:])
    v = serve_daemon._handle_request({"video_key": VAL_KEYS[4], "k": 5},
                                     cctx)
    assert {h["key"] for h in v["results"]} == set(VAL_KEYS[3:])


def test_max_connections(ctx):
    """Connections beyond --max_connections get one error line and a
    hangup; existing clients are never evicted; capacity frees when a
    client disconnects."""
    import time

    ctx["shutdown"] = False
    ready = threading.Event()
    t = threading.Thread(
        target=serve_daemon.serve_forever, args=(ctx,),
        kwargs={"tcp": ("127.0.0.1", 0), "ready_callback": ready.set,
                "max_connections": 1},
        daemon=True)
    t.start()
    assert ready.wait(30)
    host, port = ctx["listening_on"].rsplit(":", 1)
    addr = (host, int(port))

    holder = socket.create_connection(addr, timeout=30)
    hf = holder.makefile("rwb")
    hf.write(json.dumps({"op": "stats"}).encode() + b"\n")
    hf.flush()
    assert json.loads(hf.readline())["valid_rows"] >= 1

    over = socket.create_connection(addr, timeout=30)
    with over, over.makefile("rb") as of:
        refusal = json.loads(of.readline())
        assert "max_connections" in refusal["error"]
        assert of.readline() == b""  # hung up after the error line

    # the held connection keeps working (no eviction)
    hf.write(json.dumps({"op": "stats"}).encode() + b"\n")
    hf.flush()
    assert json.loads(hf.readline())["valid_rows"] >= 1
    hf.close()
    holder.close()
    time.sleep(0.3)  # let the daemon thread see EOF

    # capacity freed: a new client is admitted and can shut down
    c = socket.create_connection(addr, timeout=30)
    with c, c.makefile("rwb") as f:
        f.write(json.dumps({"op": "shutdown"}).encode() + b"\n")
        f.flush()
        assert json.loads(f.readline()) == {"ok": True}
    t.join(timeout=30)
    assert not t.is_alive()


def test_batch_window_merges_concurrent_queries(tmp_path_factory):
    """--batch_window_ms: text queries from concurrent connections merge
    into ONE retrieve call; every client still gets exactly the rows the
    unbatched handler would return (per-request k and id honored)."""
    root, ckpt_dir = _fixture_run(tmp_path_factory, "batcher")
    bctx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      batch_window_ms=120.0)
    assert bctx["batcher"] is not None

    # expected answers via the plain unbatched handler path
    want = {}
    for i, (q, k) in enumerate([("a man runs", 3), ("a dog jumps", 2),
                                (["two queries", "at once"], 4),
                                ("a man runs", 1)]):
        want[i] = serve_daemon._handle_request({"query": q, "k": k}, bctx)
    bctx["served"] = 0
    bctx["latencies"].clear()

    calls = []
    real_retrieve = bctx["retriever"].retrieve

    def counting_retrieve(*a, **kw):
        calls.append(kw.get("k"))
        return real_retrieve(*a, **kw)

    bctx["retriever"].retrieve = counting_retrieve
    got = {}

    def client(i, q, k):
        got[i] = bctx["batcher"].submit({"query": q, "k": k, "id": i})

    threads = [threading.Thread(target=client, args=(i, q, k))
               for i, (q, k) in enumerate([("a man runs", 3),
                                           ("a dog jumps", 2),
                                           (["two queries", "at once"], 4),
                                           ("a man runs", 1)])]
    [t.start() for t in threads]
    [t.join(timeout=60) for t in threads]
    bctx["retriever"].retrieve = real_retrieve

    assert len(calls) < 4, f"queries did not merge: {len(calls)} calls"
    assert bctx["served"] == 4
    for i in range(4):
        assert got[i]["id"] == i
        assert got[i]["results"] == want[i]["results"], i
    # merged responses advertise how many co-batched query rows rode along
    assert any(r.get("batched_with", 0) > 0 for r in got.values())


def test_batch_window_isolates_bad_requests(tmp_path_factory):
    """One invalid request in a window errors ALONE; its window-mates get
    normal results. Unauthorized requests are refused per item."""
    root, ckpt_dir = _fixture_run(tmp_path_factory, "batcher_err")
    bctx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      batch_window_ms=120.0,
                                      auth_token="sekrit")
    got = {}

    def client(i, req):
        got[i] = bctx["batcher"].submit(req)

    reqs = [{"query": "a man runs", "k": 2, "token": "sekrit"},
            {"query": "", "k": 2, "token": "sekrit"},      # invalid text
            {"query": "a dog jumps", "k": 0, "token": "sekrit"},  # bad k
            {"query": "a man runs", "k": 2},               # no token
            # NON-COERCIBLE k: int("three") raises — must error THIS item
            # only, with its id intact (an escape to submit's catch-all
            # would poison every window-mate and strip their ids)
            {"query": "a man runs", "k": "three", "id": "bad-k",
             "token": "sekrit"}]
    threads = [threading.Thread(target=client, args=(i, r))
               for i, r in enumerate(reqs)]
    [t.start() for t in threads]
    [t.join(timeout=60) for t in threads]

    assert len(got[0]["results"]) == 2 and "error" not in got[0]
    assert "non-empty" in got[1]["error"]
    assert "k must be" in got[2]["error"]
    assert "unauthorized" in got[3]["error"]
    assert got[4]["id"] == "bad-k" and "k must be an integer" in got[4]["error"]


def test_batch_window_single_query_matches_plain_handler(tmp_path_factory):
    """A lone query in its window (no concurrency) returns exactly what the
    plain handler returns — the batcher is a pure merge, not a new code
    path."""
    root, ckpt_dir = _fixture_run(tmp_path_factory, "batcher_solo")
    bctx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      batch_window_ms=1.0)
    plain = serve_daemon._handle_request({"query": "a man runs", "k": 3},
                                         bctx)
    solo = bctx["batcher"].submit({"query": "a man runs", "k": 3})
    assert solo["results"] == plain["results"]
    assert solo["batched_with"] == 0


@pytest.mark.slow
def test_batch_window_races_live_crud(tmp_path_factory):
    """Fuzz the interleaving --batch_window_ms opened: batched text queries
    from several threads race a mutator cycling add -> remove ->
    auto-compaction through the daemon's own entry points (all mutating
    ops lock-free, exactly like _client_loop routes them — add/remove/
    compact manage their own locking since the online-compaction change).
    Every response must be well-formed (k rows, finite scores, keys that
    existed at some point); the final state must be exactly the fixture
    gallery again."""
    root, ckpt_dir = _fixture_run(tmp_path_factory, "batchcrud")
    sub = tmp_path_factory.mktemp("batchcrud_inc")
    write_reference_dataset(str(sub), feat_dim=FEAT, seed=31,
                            splits=[("churn", 2)])
    bctx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      allow_any_path=True,
                                      compact_threshold=0.2,
                                      batch_window_ms=30.0)
    churn_keys = {"v_churn000", "v_churn001"}
    ever_valid = set(VAL_KEYS) | churn_keys
    errors: list = []
    responses: list = []
    stop = threading.Event()

    def querier(qi):
        try:
            n = 0
            while not stop.is_set() and n < 12:
                r = bctx["batcher"].submit(
                    {"query": "a man runs", "k": 3, "id": f"q{qi}.{n}"})
                responses.append(r)
                n += 1
        except Exception as e:  # pragma: no cover - the assertion payload
            errors.append(f"querier {qi}: {type(e).__name__}: {e}")

    def mutator():
        try:
            for _ in range(4):
                # mutating ops run OUTSIDE ctx["lock"], exactly like
                # _client_loop: _handle_remove takes the lock itself for
                # its O(removed) tombstone and hands a threshold-crossing
                # compaction to _compact_online AFTER releasing it (holding
                # it here would self-deadlock — the lock is not reentrant)
                r = serve_daemon._handle_request(
                    {"op": "add", "split": "churn", "data_path": str(sub)},
                    bctx)
                assert r.get("added") == 2, r
                r = serve_daemon._handle_request(
                    {"op": "remove", "keys": sorted(churn_keys)}, bctx)
                assert r.get("removed") == 2, r
        except Exception as e:
            errors.append(f"mutator: {type(e).__name__}: {e}")

    qs = [threading.Thread(target=querier, args=(i,)) for i in range(3)]
    mt = threading.Thread(target=mutator)
    [t.start() for t in qs + [mt]]
    mt.join(timeout=300)
    stop.set()
    [t.join(timeout=300) for t in qs]
    assert not errors, errors
    assert not mt.is_alive() and not any(t.is_alive() for t in qs)

    assert len(responses) >= 3
    for r in responses:
        assert "error" not in r, r
        assert len(r["results"]) == 3, r
        for h in r["results"]:
            assert h["key"] in ever_valid, (h, r)
            assert np.isfinite(h["score"]), r

    # final state: every churn row removed again; compactions ran; the
    # fixture gallery serves exactly its own keys
    st = serve_daemon._handle_request({"op": "stats"}, bctx)
    assert st["valid_rows"] == len(VAL_KEYS), st
    assert st["compactions"] >= 1, st
    with bctx["lock"]:
        q = serve_daemon._handle_request({"query": "a man runs", "k": 8},
                                         bctx)
    assert {h["key"] for h in q["results"]} == set(VAL_KEYS)


def test_text_retrieve_bucketing_parity(ctx):
    """Static-shape bucketing in _text_retrieve (pad the batch to a power
    of two, run with a bucketed k, slice back) must be invisible: results
    bit-identical to a direct unbucketed Retriever.retrieve for every
    (n_texts, k) mix — including n and k that ARE a bucket boundary and
    ones mid-bucket."""
    from cmhse_tpu.eval.serve import text_query_batch

    cfg = ctx["cfg"]
    pool = ["a man runs down the street", "a dog jumps over a fence",
            "two people talk in a kitchen", "a car drives past a house",
            "a child kicks a ball"]
    for n in (1, 2, 3, 5):
        for k in (1, 3, 8, 50):  # 50 > n_valid=8: graceful-k clamp
            texts = pool[:n]
            scores, idx = serve_daemon._text_retrieve(ctx, texts, k)
            ref_s, ref_i = ctx["retriever"].retrieve(
                *text_query_batch(ctx["vocab"], texts,
                                  cfg.data.max_sentences,
                                  cfg.data.max_words), k=k)
            assert scores.shape == ref_s.shape, (n, k, scores.shape)
            np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
            np.testing.assert_array_equal(np.asarray(scores),
                                          np.asarray(ref_s))


def test_pow2_bucket():
    assert [serve_daemon._pow2_bucket(n) for n in (1, 2, 3, 4, 5, 8, 9)] \
        == [1, 2, 4, 4, 8, 8, 16]


def test_maps_guard(monkeypatch):
    """vm.max_map_count guard (CLAUDE.md long-lived-process rule): clears
    jax caches only when the countdown elapses AND the map count is over
    the soft limit, under both daemon locks; double-checks after acquiring
    them so racing threads clear once."""
    import jax as _jax

    cleared = []
    monkeypatch.setattr(_jax, "clear_caches", lambda: cleared.append(1))
    monkeypatch.setattr(serve_daemon, "_MAPS_CHECK_EVERY", 2)
    gctx = {"lock": threading.Lock(), "ingest_lock": threading.Lock()}

    # below the limit: countdown elapses, count read, nothing cleared
    monkeypatch.setattr(serve_daemon, "_map_count", lambda: 10)
    for _ in range(4):
        serve_daemon._maybe_clear_jax_caches(gctx)
    assert not cleared and "jax_cache_clears" not in gctx

    # over the limit: clears on the next elapsed countdown only
    monkeypatch.setattr(serve_daemon, "_map_count",
                        lambda: serve_daemon._MAPS_SOFT_LIMIT + 1)
    serve_daemon._maybe_clear_jax_caches(gctx)  # countdown not yet elapsed
    assert not cleared
    serve_daemon._maybe_clear_jax_caches(gctx)
    assert cleared == [1] and gctx["jax_cache_clears"] == 1

    # real map counter works on this image
    assert serve_daemon._map_count() > 0


def test_empty_query_list_rejected(ctx):
    """all() is vacuously True on []: an empty query list used to crash
    the bucket padder with IndexError instead of a clean validation error
    (review r5)."""
    r = serve_daemon._handle_request({"query": [], "k": 3, "id": 9}, ctx)
    assert r.get("id") == 9
    assert "non-empty" in r["error"]


def test_bind_unix_refuses_regular_file(tmp_path):
    """The stale-socket cleanup must never unlink a NON-socket path an
    operator typo'd as --socket (review r5: connect() fails with ENOTSOCK
    on a regular file too, which the stale branch read as removable)."""
    victim = tmp_path / "gallery.npz"
    victim.write_bytes(b"precious")
    with pytest.raises(SystemExit, match="not a socket"):
        serve_daemon._bind_unix(str(victim))
    assert victim.read_bytes() == b"precious"


def test_client_poisons_connection_after_timeout(tmp_path):
    """A timed-out request's LATE reply must never be read as the answer
    to the NEXT request: the wire protocol has no reply-to-request
    correlation, so the client drops the connection on any mid-exchange
    IO failure and reconnects fresh (review r5 — without this every call
    after one timeout was silently off by one reply)."""
    import socket as socketlib
    import time as timelib

    sock_path = str(tmp_path / "fake.sock")
    srv = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
    srv.bind(sock_path)
    srv.listen(2)

    def server():
        # connection 1: answer AFTER the client's timeout
        c1, _ = srv.accept()
        f1 = c1.makefile("rwb")
        f1.readline()
        timelib.sleep(1.0)
        try:
            f1.write(b'{"late": true}\n')
            f1.flush()
        except OSError:
            pass
        # connection 2: the poisoned client reconnected; answer promptly
        c2, _ = srv.accept()
        f2 = c2.makefile("rwb")
        f2.readline()
        f2.write(b'{"fresh": true}\n')
        f2.flush()
        for h in (f1, c1, f2, c2):
            try:
                h.close()
            except OSError:
                pass

    from cmhse_tpu.client import ServeClient

    t = threading.Thread(target=server, daemon=True)
    t.start()
    c = ServeClient(socket_path=sock_path, timeout=0.3)
    with pytest.raises(OSError):  # socket.timeout
        c.request({"op": "stats"})
    # wait out the server's late write so it is blocked in accept() and
    # the reconnected request is answered within the client timeout
    timelib.sleep(1.2)
    assert c.request({"op": "stats"}) == {"fresh": True}
    c.close()
    srv.close()
    t.join(timeout=10)


def test_auto_compaction_rechecks_threshold_under_ingest_lock(
        tmp_path_factory, monkeypatch):
    """Removes queued behind an in-flight auto-compaction each crossed the
    threshold at their own commit time; _compact_online must re-check the
    invalid fraction AFTER acquiring ingest_lock and skip when a finished
    compaction already reclaimed the tombstones — without the re-check a
    steady remove stream produced a convoy of back-to-back full-gallery
    rebuilds (review r5)."""
    from cmhse_tpu.eval.serve import Retriever

    root, ckpt_dir = _fixture_run(tmp_path_factory, "convoy")
    pctx = serve_daemon.build_context(ckpt_dir, str(root), "val",
                                      compact_threshold=0.25)
    r = serve_daemon._handle_request(
        {"op": "remove", "keys": VAL_KEYS[:3]}, pctx)
    assert r["auto_compaction"]["compacted"] >= 3
    assert pctx["compactions"] == 1

    # the queued remove's auto-compaction leg: threshold crossed at ITS
    # commit time, but the fraction is back under it now — a second
    # rebuild must not even be planned
    def no_second_plan(self):
        raise AssertionError("redundant rebuild: plan_compaction ran "
                             "after the fraction fell below threshold")

    monkeypatch.setattr(Retriever, "plan_compaction", no_second_plan)
    out = serve_daemon._compact_online(pctx, only_above=0.25)
    assert out["compacted"] == 0
    assert "skipped" in out["note"]
    assert pctx["compactions"] == 1  # counter untouched

    # an explicit {"op": "compact"} always compacts (plan runs; restore
    # the real method so the identity-plan path is exercised)
    monkeypatch.undo()
    out = serve_daemon._handle_request({"op": "compact"}, pctx)
    assert out["compacted"] == 0 and "note" not in out
