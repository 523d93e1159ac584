"""``cmhse-serve`` — long-running retrieval daemon (unix socket or TCP).

The production shape of the serving surface (SURVEY.md section 3.5 — the
reference has no serving path at all): encode the gallery ONCE at startup
(pre-chunked / int8-prepared when large), then answer JSON-line requests
forever — from local clients over ``--socket PATH`` (AF_UNIX) or remote
ones over ``--tcp HOST:PORT``. ``cmhse-retrieve --interactive`` covers the
human-at-a-terminal case; this covers the machine-client case.

Protocol (one JSON object per line, newline-terminated, per connection):

    -> {"query": "a dog catches a frisbee", "k": 5, "id": 1}
    <- {"id": 1, "results": [{"key": "...", "score": 0.93}, ...],
        "latency_ms": 2.1}
    -> {"video_key": "v_abc123", "k": 3}          # video->paragraph
    <- {"results": [...], ...}
    -> {"op": "add", "split": "new_batch"}        # live gallery ingest:
    <- {"added": 120, "valid_rows": 5037, ...}    #   encode+append a
                                                  #   reference-layout split
    -> {"op": "remove", "keys": ["v_abc123"]}     # tombstone items live
    <- {"removed": 1, "valid_rows": 4916}
    -> {"op": "stats"}
    <- {"gallery_rows": 4917, "prepared": true, "quantized": false, ...}
    -> {"op": "shutdown"}
    <- {"ok": true}                                # then the daemon exits

Errors come back as {"id": ..., "error": "..."}; the connection stays up.
Each connection's requests are answered strictly in its own order; ACROSS
connections, handling is serialized through one lock (one device, one
program) but interleaving is scheduler-picked — don't split
order-dependent requests (add, then queries expecting it) over two
connections. Pass several queries in one request's "query" LIST to batch
the GEMM.

Two exceptions to cross-connection serialization, both on mutating ops'
EXPENSIVE phases: an {"op": "add"}'s ENCODE runs outside the request lock
(a production-sized ingest is seconds-to-minutes of device time; holding
the lock would stall every other connection's queries), and a compaction's
REBUILD (explicit {"op": "compact"} or a threshold-crossing remove's
auto-compaction; ~11 s at 1M rows) plans the compacted forms off-lock
while queries keep answering against the tombstoned-but-correct old
gallery. Queries racing an in-flight add are answered against the OLD
gallery — exactly the cross-connection ordering contract above; the add's
commit (key table + gallery append) and the compaction's swap are atomic
under the lock. Concurrent adds and compactions serialize on a separate
ingest lock.

Trust model: there is NO authentication by default — run on a unix socket
(filesystem permissions are the access control) or a loopback/firewalled
TCP address. Anyone who can reach the port can query, mutate the gallery,
and shut the daemon down. For shared networks pass --auth_token TOKEN:
every request must then carry {"token": TOKEN} (constant-time compare;
failures get {"error": "unauthorized"} and no side effects). The "add"
op opens server-side files: its "data_path" is confined to the startup
--data_path root unless the daemon was started with --allow_any_path.
"""

from __future__ import annotations

import argparse
import json
import socket
import time
from collections import deque


def _nearest_rank(sorted_vals, p: float):
    """Nearest-rank percentile: the ceil(p*n)-th smallest value (1-based) —
    the standard definition. The old ``sorted[int(p*n)]`` indexing read one
    rank too high (its "p50" over 1024 samples was element 512 of a 0-based
    list, and "p99" only landed right by accident of the min clamp)."""
    import math

    n = len(sorted_vals)
    return sorted_vals[min(n - 1, max(0, math.ceil(p * n) - 1))]


# vm.max_map_count guard (same hazard CLAUDE.md documents for the test
# suite): every XLA executable mmaps its code pages and this image's kernel
# caps a process at 65530 mappings, so a LONG-LIVED daemon under
# shape-changing churn — live adds growing the gallery, compactions
# shrinking it, new batcher merge sizes — accumulates mappings until XLA
# segfaults mid-compile. Clearing jax's executable caches unmaps the code;
# the persistent compile cache (when enabled) makes recompiles cheap.
_MAPS_SOFT_LIMIT = 40_000
_MAPS_CHECK_EVERY = 64  # /proc/self/maps reads are cheap but not free


def _map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return f.read().count(b"\n")
    except OSError:  # non-Linux host: guard disabled
        return 0


def _maybe_clear_jax_caches(ctx: dict) -> None:
    """Drop jax's executable caches when the process mapping count passes
    the soft limit. Called from ``_client_loop`` AFTER a request completes
    (no locks held); takes ingest_lock then the request lock — the same
    order as ``_handle_add`` — so no device call is in flight during the
    clear. The countdown is racy across client threads, which only skews
    HOW OFTEN the count is read, never correctness."""
    ctx["maps_countdown"] = ctx.get("maps_countdown", _MAPS_CHECK_EVERY) - 1
    if ctx["maps_countdown"] > 0:
        return
    ctx["maps_countdown"] = _MAPS_CHECK_EVERY
    if _map_count() < _MAPS_SOFT_LIMIT:
        return
    import gc

    import jax

    with ctx["ingest_lock"], ctx["lock"]:
        n = _map_count()
        if n < _MAPS_SOFT_LIMIT:  # another thread already cleared
            return
        jax.clear_caches()
        gc.collect()
        ctx["jax_cache_clears"] = ctx.get("jax_cache_clears", 0) + 1
        print(f"map count {n} >= {_MAPS_SOFT_LIMIT}: cleared jax caches "
              f"-> {_map_count()} maps", flush=True)


def _auth_error(req: dict, ctx: dict) -> dict | None:
    """Constant-time token check when the daemon was started with
    --auth_token; None = authorized. No default token: unix-socket file
    permissions / loopback binding are the default trust boundary (see the
    module docstring's threat model)."""
    token = ctx.get("auth_token")
    if token is None:
        return None
    import hmac

    got = req.get("token")
    # compare utf-8 bytes: compare_digest on str raises TypeError for
    # non-ASCII input (either side), which would turn a wrong-alphabet
    # token into a crash instead of "unauthorized" — and brick startup
    # --warm for a daemon whose own token is non-ASCII
    if isinstance(got, str) and hmac.compare_digest(
            got.encode("utf-8"), token.encode("utf-8")):
        return None
    return {"error": "unauthorized: this daemon requires a valid 'token' "
                     "field on every request (started with --auth_token)"}


def _compact(ctx: dict) -> dict:
    """Compact BOTH directions' galleries (reclaim tombstoned rows); the
    daemon's key table is untouched — gallery_keys VALUES (row ids into
    ctx['keys']) survive compaction, only their row positions move.

    This is the INLINE form (runs under whatever locks the caller holds)
    for direct/test callers; the daemon's socket path uses
    :func:`_compact_online`, which keeps queries flowing during the
    rebuild."""
    r = ctx["retriever"]
    rows_before = int(r.gallery.shape[0])
    r.compact()
    if ctx.get("retriever_text") is not None:
        ctx["retriever_text"].compact()
    ctx["compactions"] += 1
    return {"compacted": rows_before - int(r.gallery.shape[0]),
            "gallery_rows": int(r.gallery.shape[0]),
            "valid_rows": r.n_valid}


def _compact_online(ctx: dict, only_above: float | None = None) -> dict:
    """ONLINE compaction: the expensive rebuild (`plan_compaction` — a
    measured ~11 s at 1M rows, PERFORMANCE.md CRUD table) runs OUTSIDE the
    request lock, so queries on other connections keep answering against
    the tombstoned-but-correct old forms; only the swap (`apply_compaction`
    — host pointer swaps plus one mask update if removes raced the build)
    holds ``ctx["lock"]`` (VERDICT r4 weak 2 — the inline form froze all
    traffic for the full rebuild). Serializes with adds and other
    compactions on ``ingest_lock`` (appends must not race a plan — the
    plan's length snapshot would go stale; removes MAY race — apply
    replays them onto the new forms). Callers must NOT hold the request
    lock (same contract as :func:`_handle_add`).

    ``only_above``: auto-compaction passes its threshold so the invalid
    fraction is RE-CHECKED after ``ingest_lock`` is acquired — every
    remove that lands during an in-flight ~11 s plan still crossed the
    threshold at its own commit time, and without the re-check each one
    queued another full-gallery rebuild reclaiming only its few raced
    rows (a convoy of back-to-back plans holding ``ingest_lock`` for
    minutes — review r5). An explicit ``{"op": "compact"}`` passes None
    and always compacts."""
    import threading

    import numpy as np

    with ctx.setdefault("ingest_lock", threading.Lock()):
        r = ctx["retriever"]
        if only_above is not None and r.invalid_fraction <= only_above:
            return {"compacted": 0,
                    "gallery_rows": int(r.gallery.shape[0]),
                    "valid_rows": r.n_valid,
                    "note": "skipped: a compaction that finished while "
                            "this request waited already reclaimed the "
                            "tombstones"}
        # a text side built by a racing video_key request AFTER this read
        # simply stays uncompacted until the next compaction — it is
        # constructed from the startup encode with the removal ledger
        # replayed, so it is correct either way
        rt = ctx.get("retriever_text")
        rows_before = int(r.gallery.shape[0])
        plans = [(tr, tr.plan_compaction())
                 for tr in (r, rt) if tr is not None]
        with ctx.setdefault("lock", threading.Lock()):
            for tr, plan in plans:
                if not isinstance(plan, np.ndarray):  # ndarray = identity
                    tr.apply_compaction(plan)
            ctx["compactions"] += 1
            return {"compacted": rows_before - int(r.gallery.shape[0]),
                    "gallery_rows": int(r.gallery.shape[0]),
                    "valid_rows": r.n_valid}


def _handle_request(req: dict, ctx: dict) -> dict:
    """Pure request->response step (socket-free, so tests can hit it
    directly); ``ctx`` carries the retrievers + dataset built at startup."""
    if not isinstance(req, dict):
        return {"error": "request must be a JSON object"}
    rid = req.get("id")

    def reply(payload: dict) -> dict:
        return {"id": rid, **payload} if rid is not None else payload

    denied = _auth_error(req, ctx)
    if denied is not None:
        return reply(denied)
    if req.get("op") == "shutdown":
        ctx["shutdown"] = True
        return reply({"ok": True})
    if req.get("op") == "add":
        return reply(_handle_add(req, ctx))
    if req.get("op") == "compact":
        # online form: the rebuild runs off-lock (callers must not hold
        # the request lock around mutating ops — see _client_loop)
        return reply(_compact_online(ctx))
    if req.get("op") == "remove":
        return reply(_handle_remove(req, ctx))
    if req.get("op") == "stats":
        r = ctx["retriever"]
        lat = sorted(ctx["latencies"])
        pct = ((lambda p: round(_nearest_rank(lat, p), 3)) if lat
               else (lambda p: None))
        return reply({
            "gallery_rows": int(r.gallery.shape[0]),
            "valid_rows": r.n_valid,
            "invalid_fraction": round(r.invalid_fraction, 4),
            "compactions": ctx["compactions"],
            "prepared": r._prepared is not None,
            "quantized": r.quantize,
            "side": r.side,
            "split": ctx["split"],
            "requests_served": ctx["served"],
            "jax_cache_clears": ctx.get("jax_cache_clears", 0),
            # over the last len(lat) (<= 1024) query requests
            "latency_ms_p50": pct(0.50),
            "latency_ms_p90": pct(0.90),
            "latency_ms_p99": pct(0.99),
        })

    k = int(req.get("k", 5))
    if k < 1:
        return reply({"error": f"k must be >= 1, got {k}"})
    t0 = time.perf_counter()
    if "query" in req:
        texts = req["query"] if isinstance(req["query"], list) \
            else [req["query"]]
        if not texts or not all(isinstance(t, str) and t.strip()
                                for t in texts):
            # `not texts`: all() is vacuously True on [], and an empty
            # list used to fall through to an IndexError in the bucket
            # padder (review r5)
            return reply({"error": "query must be a non-empty string "
                                   "(or non-empty list of them)"})
        scores, idx = _text_retrieve(ctx, texts, k)
    elif "video_key" in req:
        from cmhse_tpu.eval.serve import key_index, video_query_batch

        key = req["video_key"]
        # resolve the key across EVERY loaded split — the startup gallery
        # plus any splits ingested live via {"op": "add"} (a just-added
        # video must be usable as a query, not only as a gallery item);
        # key_index is cached per dataset, so this is O(splits) per request
        src = next((d for d in ctx["datasets"] if key in key_index(d)),
                   None)
        if src is None:
            return reply({"error": f"video key {key!r} not in the "
                                   f"{ctx['split']} split or any "
                                   "live-added split"})
        qframes, qframe_len, qclip_len = video_query_batch(
            src, ctx["cfg"].data, [key])
        r = ctx.get("retriever_text")
        if r is None:
            build = ctx.get("build_text_side")
            if build is None:
                return reply({"error": "text side unavailable: this "
                                       "context has no startup encode to "
                                       "build it from"})
            r = ctx["retriever_text"] = build()
            # replay live adds BEFORE removals: a removal may target a row
            # that was added after startup
            for encoded, row_ids in ctx["added"]:
                r.add_to_gallery(keys=row_ids, encoded=encoded)
            # the ledger is consumed: future adds go straight to this
            # retriever, and holding the encoded tuples (full embedding
            # copies) would pin them for the daemon's lifetime
            ctx["added"].clear()
            if ctx["removed_ids"]:
                r.remove_from_gallery(ctx["removed_ids"])
            # the closure is consumed too: it pins the STARTUP text encode,
            # which this retriever's own compactions would otherwise never
            # free (review r5)
            ctx["build_text_side"] = None
        # bucket k for the same reason as _text_retrieve: a per-request k
        # is a static jit arg, and recompiling under the lock stalls serving
        scores, idx = r.retrieve_video(qframes, qframe_len, qclip_len,
                                       k=max(8, _pow2_bucket(k)))
        scores, idx = scores[:, :k], idx[:, :k]
    else:
        return reply({"error": "expected 'query', 'video_key', or 'op'"})

    ms = (time.perf_counter() - t0) * 1e3
    r_used = ctx["retriever"] if "query" in req else ctx["retriever_text"]
    out = _format_rows(ctx, r_used, scores, idx)
    # a list "query" gets a list of result rows; single query / video_key
    # gets the one row directly
    batched = isinstance(req.get("query"), list)
    ctx["served"] += 1
    ctx["latencies"].append(ms)
    return reply({"results": out if batched else out[0],
                  "latency_ms": round(ms, 3)})


def _handle_remove(req: dict, ctx: dict) -> dict:
    """Tombstone items by name, then auto-compact ONLINE when the invalid
    fraction crosses the threshold. The remove itself is O(removed) under
    ``ctx["lock"]``; a threshold-crossing remove hands off to
    :func:`_compact_online` AFTER releasing it, so the (seconds-at-scale)
    rebuild never stalls other connections' queries. Callers must NOT
    hold the request lock (same contract as :func:`_handle_add`;
    ``_client_loop`` routes all mutating ops lock-free)."""
    import threading

    keys = req.get("keys")
    if not isinstance(keys, list) or not keys:
        return {"error": "remove needs a non-empty 'keys' list"}
    with ctx.setdefault("lock", threading.Lock()):
        # the retriever's gallery_keys are ROW IDS into the daemon's
        # unified key table (startup split + live-added items — what
        # _row_key maps back to names); translate the client's video keys
        # through the incrementally-maintained name->newest-row map (a
        # per-request dict over ctx['keys'] was an O(N) stall at 1M rows)
        idx = ctx["key_to_row"]
        ids = [idx[k] for k in keys if k in idx]
        # a removed video disappears from BOTH directions' galleries; the
        # ledger replays removals onto the lazily-built text side (which is
        # constructed from the STARTUP encode and would otherwise resurrect
        # rows removed before its first use)
        ctx["removed_ids"].extend(ids)
        # removed NAMES become re-addable: the add op's duplicate check
        # skips them (a later ingest may carry a corrected 'v_abc')
        ctx["removed_keys"].update(k for k in keys if k in idx)
        removed = ctx["retriever"].remove_from_gallery(ids)
        if ctx.get("retriever_text") is not None:
            ctx["retriever_text"].remove_from_gallery(ids)
        out = {"removed": removed, "valid_rows": ctx["retriever"].n_valid}
        # auto-compaction: under remove/re-add churn the gallery otherwise
        # grows without bound while dead rows burn GEMM on every query
        thr = ctx.get("compact_threshold")
        needs_compact = (thr is not None and removed
                         and ctx["retriever"].invalid_fraction > thr)
    if needs_compact:
        # only_above: re-checked under ingest_lock so removes queued behind
        # an in-flight compaction don't each rebuild the gallery again
        out["auto_compaction"] = _compact_online(ctx, only_above=thr)
    return out


def _pow2_bucket(n: int) -> int:
    """Next power of two >= n (n >= 1) — the static-shape bucket for the
    daemon's jitted query programs."""
    return 1 << (n - 1).bit_length()


def _text_retrieve(ctx: dict, texts: list, k: int):
    """Tokenize + encode + top-k for TEXT queries against the video-side
    gallery — the one shared compute core behind both the plain query op
    and the cross-connection micro-batcher.

    STATIC-SHAPE BUCKETING: the encode program's batch dim and retrieve's
    ``k`` are static under jit, so without it every distinct
    (len(texts), k) pair the client mix produces — batcher merges of size
    1..N times arbitrary k values — triggers a fresh XLA compile UNDER THE
    REQUEST LOCK (multi-second through the axon remote-compile relay),
    stalling all traffic until every combination is warm. Padding the
    batch to the next power of two (duplicated rows, dropped after) and
    running with the bucketed k (extra columns sliced off) caps the
    program count at O(log max_batch * log max_k). Results are
    bit-identical to the unbucketed call: retrieve() returns the exact
    sorted top-k with dense tie order (tests/test_topk.py), so the first
    k columns of a top-k_b call equal the top-k call."""
    from cmhse_tpu.eval.serve import text_query_batch

    cfg = ctx["cfg"]
    n = len(texts)
    # k bucket floored at 8: every k <= 8 (the common range; the client
    # default is 5) shares ONE program — and it's the one --warm compiles
    nb, kb = _pow2_bucket(n), max(8, _pow2_bucket(k))
    scores, idx = ctx["retriever"].retrieve(
        *text_query_batch(ctx["vocab"], texts + [texts[0]] * (nb - n),
                          cfg.data.max_sentences, cfg.data.max_words),
        k=kb)
    return scores[:n, :k], idx[:n, :k]


def _format_rows(ctx: dict, retriever, scores, idx) -> list:
    """Score/index rows -> [{"key", "score"}, ...] result rows."""
    return [
        [{"key": _row_key(ctx["keys"], retriever, int(j)),
          "score": round(float(s), 6)}
         for s, j in zip(row_s, row_i)]
        for row_s, row_i in zip(scores, idx)
    ]


class _QueryBatcher:
    """Cross-connection text-query micro-batching (``--batch_window_ms``).

    Without it, N concurrent single-query clients serialize through the
    request lock one device GEMM each; with it, the first query to arrive
    becomes the WINDOW LEADER: it waits ``window_s`` (holding no locks),
    absorbs every text query that lands meanwhile, and runs ONE merged
    encode+retrieve for all of them under the request lock. Followers
    block on an event and get their slice of the merged result. The
    classic serving throughput/latency trade: each query pays up to one
    window of extra latency to turn N tiny device calls into one batched
    call.

    Only pure text queries (``{"query": ...}``, no ``op``) are batched —
    mutating ops and video queries keep their existing paths and ordering
    semantics. Per-request auth, validation, ``k``, and ``id`` are still
    honored per item; one bad request errors alone without poisoning its
    window-mates.

    ADAPTIVE CLOSE (``quiet_gap_s > 0``) was built and MEASURED OFF on
    this hardware (VERDICT r4 weak 4; on-chip A/B 2026-08-20,
    scripts/serve_bench.py, window 5 ms, PERFORMANCE.md): ending the
    window early once arrivals go quiet for 0.5 ms saved a lone client
    only ~6 ms of p50 (54.2 vs 60.5 ms — the ~50 ms relay device call
    dominates) but cost 3.3x of the 8-client throughput (38.5 vs 126.7
    QPS): concurrent clients' arrivals are spaced by MILLISECONDS of
    socket/scheduler jitter on this 1-core host, so any sub-window quiet
    gap closes mid-wavefront and splits one batched device call into
    several. The full-window sleep is cheap insurance (5 ms vs the 50 ms
    call it amortizes); default ``quiet_gap_s=0`` keeps it, the knob
    remains for hardware where arrival jitter is tighter than the
    device-call cost.
    """

    QUIET_GAP_S = 0.0  # plain full-window sleep (measured winner — above)

    def __init__(self, ctx: dict, window_s: float,
                 quiet_gap_s: float | None = None):
        import threading

        self.ctx = ctx
        self.window_s = window_s
        self.quiet_gap_s = (self.QUIET_GAP_S if quiet_gap_s is None
                            else quiet_gap_s)
        self._mutex = threading.Lock()
        self._pending: list[dict] = []

    def submit(self, req: dict) -> dict:
        """Handle one text-query request through the current window; call
        WITHOUT the request lock held (the leader takes it itself)."""
        import threading

        # latency is stamped HERE, before the window wait: batching's whole
        # cost is queueing delay, so per-reply latency_ms (and the stats
        # quantiles fed from it) must include it — a timer started after the
        # leader's sleep understated client-observed latency by up to one
        # window in exactly the mode whose price is that window (ADVICE r4)
        item = {"req": req, "done": threading.Event(), "resp": None,
                "t0": time.perf_counter()}
        with self._mutex:
            self._pending.append(item)
            leader = len(self._pending) == 1
        if not leader:
            # generous safety valve: if the leader thread is killed hard
            # enough to skip its finally, don't hang the connection forever
            if not item["done"].wait(timeout=max(600.0, 100 * self.window_s)):
                rid = req.get("id")
                err = {"error": "query batch leader never completed"}
                return {"id": rid, **err} if rid is not None else err
            return item["resp"]
        if not self.quiet_gap_s:
            time.sleep(self.window_s)  # plain full-window sleep
        else:
            # adaptive close: re-check arrivals every quiet gap; the first
            # gap with NO new query ends the window (the wavefront is
            # absorbed), bounded by the configured window either way
            deadline = time.perf_counter() + self.window_s
            seen = 1  # just us
            while True:
                now = time.perf_counter()
                if now >= deadline:
                    break
                time.sleep(min(self.quiet_gap_s, deadline - now))
                with self._mutex:
                    n = len(self._pending)
                if n == seen:
                    break
                seen = n
        with self._mutex:
            batch, self._pending = self._pending, []
        try:
            self._run(batch)
        except Exception as e:  # pragma: no cover - defensive
            for it in batch:
                if it["resp"] is None:
                    rid = it["req"].get("id") if isinstance(it["req"],
                                                            dict) else None
                    err = {"error": f"{type(e).__name__}: {e}"}
                    # keep the protocol's id-echo contract even on the
                    # catch-all path (review r5)
                    it["resp"] = ({"id": rid, **err} if rid is not None
                                  else err)
        finally:
            for it in batch:
                it["done"].set()
        return item["resp"]

    def _run(self, batch: list) -> None:
        """Validate each item, run ONE merged retrieve for the valid ones,
        split the rows back out. Mirrors _handle_request's text-query
        contract exactly (same helpers, same reply shapes, same stats)."""
        live = []  # (item, texts, k, batched, rid)
        for it in batch:
            req = it["req"]
            rid = req.get("id")

            def reply(payload, rid=rid):
                return {"id": rid, **payload} if rid is not None else payload

            denied = _auth_error(req, self.ctx)
            if denied is not None:
                it["resp"] = reply(denied)
                continue
            # per-item try: a malformed k (e.g. "three") must error THIS
            # item only — if it escaped to submit's catch-all, every
            # window-mate would get the error reply with its "id" stripped
            try:
                k = int(req.get("k", 5))
            except (TypeError, ValueError):
                it["resp"] = reply({"error": "k must be an integer, got "
                                             f"{req.get('k')!r}"})
                continue
            if k < 1:
                it["resp"] = reply({"error": f"k must be >= 1, got {k}"})
                continue
            texts = req["query"] if isinstance(req["query"], list) \
                else [req["query"]]
            if not texts or not all(isinstance(t, str) and t.strip()
                                    for t in texts):
                it["resp"] = reply({"error": "query must be a non-empty "
                                             "string (or non-empty list "
                                             "of them)"})
                continue
            live.append((it, texts, k, isinstance(req.get("query"), list),
                         reply))
        if not live:
            return
        merged = [t for _, texts, _, _, _ in live for t in texts]
        k_max = max(k for _, _, k, _, _ in live)
        with self.ctx["lock"]:
            scores, idx = _text_retrieve(self.ctx, merged, k_max)
            rows = _format_rows(self.ctx, self.ctx["retriever"], scores, idx)
            # per-ITEM latency from each item's own submit() stamp — the
            # leader's includes its window sleep, a follower's its shorter
            # wait; stats mutate under the request lock, same as the
            # unbatched path
            done = time.perf_counter()
            per_ms = [(done - it["t0"]) * 1e3 for it, *_ in live]
            self.ctx["served"] += len(live)
            self.ctx["latencies"].extend(per_ms)
        start = 0
        for (it, texts, k, batched, reply), ms in zip(live, per_ms):
            mine = [row[:k] for row in rows[start:start + len(texts)]]
            start += len(texts)
            it["resp"] = reply({"results": mine if batched else mine[0],
                                "latency_ms": round(ms, 3),
                                "batched_with": len(merged) - len(texts)})


def _dup_keys(new_keys, ctx: dict) -> list:
    """Names already live in the gallery (removed names don't count as
    duplicates: a later ingest may carry a corrected version of a
    tombstoned video — its old row stays dead; the name maps to the newest
    row from here on)."""
    return sorted((set(new_keys) & ctx["key_set"]) - ctx["removed_keys"])


def _handle_add(req: dict, ctx: dict) -> dict:
    """Live gallery ingest: encode a reference-layout split ONCE and append
    it to the serving gallery (both directions) — new videos land on disk
    in the same layout the startup gallery came from, then a client points
    the daemon at them: {"op": "add", "split": "test", "data_path": ...?}.
    Appends extend the prepared serving form incrementally
    (``Retriever.add_to_gallery``), not by re-encoding the whole gallery.

    Locking (VERDICT r3 weak 1): the ENCODE runs outside the request lock —
    a production-sized ingest is seconds-to-minutes of device time, during
    which queries on other connections keep flowing against the OLD gallery
    (the module docstring's cross-connection ordering contract). Only the
    commit (key table + ledger + gallery appends) holds ``ctx["lock"]``;
    concurrent adds serialize on ``ctx["ingest_lock"]``. Callers
    (``_client_loop``) must NOT hold the request lock around this op.

    Trust (VERDICT r3 missing 3): a client-supplied ``data_path`` makes the
    daemon open files server-side; it is confined to the startup data root
    unless the daemon was started with ``--allow_any_path``."""
    import os
    import threading

    from cmhse_tpu.data import PrecompDataset, batches_from_dataset
    from cmhse_tpu.eval.encode import encode_gallery_device

    split = req.get("split")
    if not isinstance(split, str) or not split:
        return {"error": "add needs a 'split' (and optional 'data_path')"}
    cfg = ctx["cfg"]
    path = req.get("data_path") or ctx["data_path"]
    if req.get("data_path") and not ctx.get("allow_any_path"):
        # fail CLOSED on a context without a startup root (hand-assembled
        # test/embedding contexts): there is nothing to confine the
        # client-supplied path to, so reject it instead of TypeError-ing
        # inside realpath (ADVICE r4)
        if ctx.get("data_path") is None:
            return {"error": "this daemon has no startup data root to "
                             "confine 'data_path' to; build the context "
                             "with a data_path or enable allow_any_path"}
        root = os.path.realpath(ctx["data_path"])
        target = os.path.realpath(path)
        if os.path.commonpath([root, target]) != root:
            return {"error": f"data_path {str(path)!r} is outside the "
                             f"startup data root {ctx['data_path']!r}; "
                             "start the daemon with --allow_any_path to "
                             "serve splits from arbitrary directories"}
    # hand-built test contexts may lack the locks; dict.setdefault is
    # GIL-atomic, so late creation is race-free
    with ctx.setdefault("ingest_lock", threading.Lock()):
        try:
            new_ds = PrecompDataset(path, split, ctx["vocab"],
                                    feat_dim=cfg.data.feat_dim,
                                    flat=not cfg.model.hierarchical)
        except (OSError, KeyError, ValueError) as e:
            return {"error": f"cannot open split {split!r} under {path}: {e}"}
        # advisory duplicate pre-check: fail BEFORE the expensive encode;
        # re-checked authoritatively under the request lock at commit (a
        # concurrent remove may change removed_keys while we encode)
        dup = _dup_keys(new_ds.keys, ctx)
        if dup:
            return {"error": f"{len(dup)} key(s) already in the gallery "
                             f"(e.g. {dup[0]!r}); remove them first or "
                             "rename"}
        r = ctx["retriever"]
        encoded = encode_gallery_device(
            r.model, r.params,
            batches_from_dataset(new_ds, cfg.data, shuffle=False),
            return_ids=True)
        with ctx.setdefault("lock", threading.Lock()):
            dup = _dup_keys(new_ds.keys, ctx)
            if dup:
                return {"error": f"{len(dup)} key(s) already in the "
                                 f"gallery (e.g. {dup[0]!r}); remove them "
                                 "first or rename"}
            base = len(ctx["keys"])
            row_ids = list(range(base, base + len(new_ds)))
            # extend the key table BEFORE touching the galleries: if one
            # direction's append fails midway the daemon stays consistent
            # (that direction just misses the new rows — recoverable with
            # remove+re-add) instead of serving gallery_keys past the end
            # of the table
            ctx["keys"].extend(new_ds.keys)
            ctx["key_set"].update(new_ds.keys)
            ctx["key_to_row"].update(
                {k: base + i for i, k in enumerate(new_ds.keys)})
            ctx["datasets"].append(new_ds)  # added videos stay queryable
            ctx["removed_keys"] -= set(new_ds.keys)
            r.add_to_gallery(keys=row_ids, encoded=encoded)
            if ctx["retriever_text"] is not None:
                ctx["retriever_text"].add_to_gallery(keys=row_ids,
                                                     encoded=encoded)
            else:
                # the text side builds lazily from the STARTUP encode;
                # ledger the encoded tuple so the build replays live adds
                # (mirrors removed_ids)
                ctx["added"].append((encoded, row_ids))
            return {"added": len(new_ds), "split": split,
                    "gallery_rows": int(r.gallery.shape[0]),
                    "valid_rows": r.n_valid}


def _row_key(keys: list, retriever, row: int):
    if retriever.gallery_keys is None:
        return row
    return keys[int(retriever.gallery_keys[row])]


def _bind_unix(sock_path: str) -> socket.socket:
    import os

    if os.path.exists(sock_path):
        # only a path that IS a socket may ever be unlinked: the stale-
        # socket cleanup must not delete a regular file or directory an
        # operator typo'd as --socket (review r5 — connect() fails with
        # ENOTSOCK on a file too, which the except branch used to read as
        # "stale, remove it")
        import stat

        if not stat.S_ISSOCK(os.stat(sock_path).st_mode):
            raise SystemExit(
                f"--socket {sock_path} exists and is not a socket; "
                "refusing to remove it")
        # refuse to steal a LIVE daemon's socket (a double-start would
        # unlink it out from under the running process); only remove a
        # stale path nothing answers on
        probe = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        try:
            probe.connect(sock_path)
        except OSError:
            os.unlink(sock_path)
        else:
            raise SystemExit(
                f"a daemon is already serving on {sock_path}; pass a "
                "different --socket or stop it first")
        finally:
            probe.close()
    server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    server.bind(sock_path)
    return server


def _bind_tcp(host: str, port: int) -> socket.socket:
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    # a restarted daemon must not wait out TIME_WAIT on its own old port
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind((host, port))
    return server


def _access_log(ctx: dict, req, resp: dict) -> None:
    """One JSONL record per wire request when the daemon was started with
    ``--log_jsonl`` (observability parity with the train loop's log.jsonl;
    the reference logged nothing request-shaped — it had no serving path).
    File writes hold CPython's internal file lock, so client threads can
    log concurrently."""
    log = ctx.get("logger")
    if log is None:
        return
    if not isinstance(req, dict):
        op = "bad_json"
    elif "query" in req:
        op = "query"
    elif "video_key" in req:
        op = "video_key"
    else:
        op = str(req.get("op", "unknown"))
    fields = {"op": op, "ok": "error" not in resp}
    for k in ("latency_ms", "added", "removed", "valid_rows", "error"):
        if k in resp:
            fields[k] = resp[k]
    log.log("serve_request", **fields)


# largest accepted request line: thousands of batched list-query sentences
# fit comfortably; a runaway (or malicious, on a TCP listener) line cannot
# balloon the daemon's memory
MAX_LINE_BYTES = 1 << 20


def _client_loop(conn: socket.socket, ctx: dict) -> None:
    """One connected client: many requests per connection. Request HANDLING
    from all clients is serialized through ``ctx["lock"]`` (one chip, one
    program — and the add/remove ledgers and stats are plain Python state),
    but reads wait OUTSIDE the lock, so an idle or slow-writing client
    never blocks a busy one."""
    try:
        with conn, conn.makefile("rwb") as f:
            while True:
                line = f.readline(MAX_LINE_BYTES + 1)
                if not line:
                    break
                if len(line) > MAX_LINE_BYTES:
                    # an oversized request: reply, then hang up (a partial
                    # line can't be resynchronized mid-stream). NB
                    # readline(size) overshoots its cap only by up to one
                    # buffer chunk (~8 KiB), so memory stays bounded.
                    f.write((json.dumps(
                        {"error": f"request line exceeds {MAX_LINE_BYTES} "
                                  "bytes; split it (e.g. several smaller "
                                  "'query' lists)"}) + "\n").encode())
                    f.flush()
                    # if the line came back PARTIAL, drain its tail
                    # (bounded chunks, capped total) before closing:
                    # unread receive-buffer bytes at close trigger a TCP
                    # RST that can destroy the reply in flight
                    drained = 0
                    while (not line.endswith(b"\n")
                           and drained < (64 << 20)):
                        line = f.readline(MAX_LINE_BYTES)
                        if not line:
                            break
                        drained += len(line)
                    break
                line = line.strip()
                if not line:
                    continue
                try:
                    req = json.loads(line)
                except json.JSONDecodeError as e:
                    req, resp = None, {"error": f"bad JSON: {e}"}
                else:
                    try:
                        if (isinstance(req, dict) and req.get("op")
                                in ("add", "remove", "compact")):
                            # mutating ops manage their own locking: add's
                            # encode and compaction's rebuild run WITHOUT
                            # the request lock so they don't stall every
                            # other connection's queries; only their
                            # commit/swap takes ctx["lock"] (see
                            # _handle_add / _handle_remove /
                            # _compact_online)
                            resp = _handle_request(req, ctx)
                        elif (ctx.get("batcher") is not None
                              and isinstance(req, dict) and "op" not in req
                              and "query" in req):
                            # text queries merge across connections into
                            # one device call per window (--batch_window_ms)
                            resp = ctx["batcher"].submit(req)
                        else:
                            with ctx["lock"]:
                                resp = _handle_request(req, ctx)
                    except Exception as e:  # must outlive requests
                        resp = {"error": f"{type(e).__name__}: {e}"}
                _access_log(ctx, req, resp)
                f.write((json.dumps(resp) + "\n").encode())
                f.flush()
                _maybe_clear_jax_caches(ctx)
                if ctx["shutdown"]:
                    break
    except OSError as e:
        # a client vanished mid-exchange (BrokenPipe/ConnectionReset from
        # write/flush/read) — the daemon must outlive CLIENTS too
        print(f"client connection dropped: {e}")


def serve_forever(ctx: dict, sock_path: str | None = None,
                  ready_callback=None,
                  tcp: tuple[str, int] | None = None,
                  server: socket.socket | None = None,
                  max_connections: int | None = None) -> None:
    """Accept loop: one thread per connected client, requests serialized
    through ``ctx["lock"]`` (see :func:`_client_loop`), so an idle client
    never blocks a busy one. Listens on a unix socket (``sock_path``) or
    TCP (``tcp=(host, port)``, port 0 picks an ephemeral one); same
    JSON-lines protocol either way. The bound address lands in
    ``ctx["listening_on"]`` before ``ready_callback`` fires.

    ``server``: an already-bound socket matching sock_path/tcp — ``main``
    binds BEFORE the (minutes-long at scale) startup gallery encode so a
    taken port/path fails in milliseconds, then hands the socket here.

    ``max_connections``: cap on concurrently-connected clients (each holds
    a thread; without a cap, idle clients accumulate threads forever on a
    TCP listener). Excess connections get one error line and a hangup —
    refusal over eviction, so an established client's stream is never cut
    mid-protocol. None = unlimited (the unix-socket default)."""
    import os
    import threading

    if (sock_path is None) == (tcp is None):
        raise ValueError("pass exactly one of sock_path / tcp")
    ctx.setdefault("lock", threading.Lock())
    ctx.setdefault("ingest_lock", threading.Lock())
    if server is None:
        server = _bind_unix(sock_path) if sock_path is not None \
            else _bind_tcp(*tcp)
    clients: list[tuple[socket.socket, threading.Thread]] = []
    try:
        server.listen(8)
        if sock_path is not None:
            ctx["listening_on"] = sock_path
        else:
            host, port = server.getsockname()[:2]
            ctx["listening_on"] = f"{host}:{port}"
        print(f"cmhse-serve listening on {ctx['listening_on']}")
        if ready_callback is not None:
            ready_callback()
        # accept with a timeout so a shutdown request handled on a client
        # thread stops the daemon within half a second
        server.settimeout(0.5)
        while not ctx["shutdown"]:
            try:
                conn, _ = server.accept()
            except TimeoutError:
                continue
            clients = [(c, th) for c, th in clients if th.is_alive()]
            if (max_connections is not None
                    and len(clients) >= max_connections):
                try:
                    conn.sendall((json.dumps(
                        {"error": f"server at max_connections "
                                  f"({max_connections}); retry later"})
                        + "\n").encode())
                except OSError:
                    pass
                conn.close()
                continue
            t = threading.Thread(target=_client_loop, args=(conn, ctx),
                                 daemon=True)
            t.start()
            clients.append((conn, t))
    finally:
        server.close()
        # stop the READ side of every surviving connection (unblocks their
        # threads' readline with EOF) but let in-flight replies finish, then
        # give the threads a moment to drain
        for c, _ in clients:
            try:
                c.shutdown(socket.SHUT_RD)
            except OSError:
                pass  # already closed by its own thread
        for _, t in clients:
            t.join(timeout=2)
        if sock_path is not None and os.path.exists(sock_path):
            os.unlink(sock_path)


def _cache_fingerprint(checkpoint: str, dataset, cfg) -> str:
    """Freshness key for --gallery_cache: any change to the checkpoint
    (config.json is rewritten on every best-save), the split's caption or
    feature files, or the model config invalidates the cache."""
    import os

    def _mtime(p):
        try:
            return os.path.getmtime(p)
        except OSError:
            return None

    return json.dumps({
        "checkpoint": os.path.abspath(checkpoint),
        "ckpt_mtime": _mtime(os.path.join(checkpoint, "config.json"))
                      or _mtime(checkpoint),
        "data_path": os.path.abspath(dataset.data_path),
        "split": dataset.split,
        "n": len(dataset),
        "captions_mtime": _mtime(os.path.join(
            dataset.data_path, f"{dataset.split}_captions.json")),
        "features_mtime": _mtime(dataset._h5_path),
        "flat": dataset.flat,
        "model_cfg": repr(cfg.model),
    }, sort_keys=True)


def _load_or_encode_gallery(model, params, dataset, cfg,
                            cache_path: str | None, checkpoint: str):
    """The startup gallery encode dominates daemon start time at scale;
    ``--gallery_cache`` extends encode-once/serve-forever across RESTARTS
    by persisting the encoded tuple, keyed by a freshness fingerprint. A
    stale or mismatched cache is re-encoded and overwritten, never
    trusted. bf16 embeddings are stored as (exact) f32 — npz can't carry
    bf16 — and cast back losslessly on load."""
    import os

    import numpy as np

    from cmhse_tpu.data import batches_from_dataset
    from cmhse_tpu.eval.encode import encode_gallery_device

    fp = _cache_fingerprint(checkpoint, dataset, cfg) if cache_path else None
    if cache_path and os.path.exists(cache_path):
        try:
            with np.load(cache_path, allow_pickle=False) as z:
                if str(z["fingerprint"]) == fp:
                    import jax.numpy as jnp

                    out = []
                    for name in ("v", "p"):
                        a = z[name]
                        dt = (jnp.bfloat16
                              if str(z[f"{name}_dtype"]) == "bfloat16"
                              else a.dtype)
                        # ALWAYS device-put: a host numpy gallery would be
                        # re-transferred to the device on every query (jit
                        # does not cache numpy-arg placements) — the f32
                        # cache-hit path used to serve slower than a fresh
                        # encode at sub-streaming sizes (review r5)
                        out.append(jnp.asarray(a, dtype=dt))
                    print(f"cmhse-serve: gallery loaded from cache "
                          f"{cache_path} (encode skipped)")
                    return (*out, z["valid"], z["ids"])
            print("cmhse-serve: gallery cache is stale; re-encoding")
        except Exception as e:  # corrupt cache must not block startup
            print(f"cmhse-serve: unreadable gallery cache ({e}); "
                  "re-encoding")
    encoded = encode_gallery_device(
        model, params,
        batches_from_dataset(dataset, cfg.data, shuffle=False),
        return_ids=True,
    )
    if cache_path:
        v, p, valid, ids = encoded
        arrs = {}
        for name, a in (("v", v), ("p", p)):
            a = np.asarray(a)
            arrs[f"{name}_dtype"] = str(a.dtype)
            if a.dtype not in (np.float32, np.float64):
                a = a.astype(np.float32)  # exact for bf16
            arrs[name] = a
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as fh:  # file object: savez can't append .npz
            np.savez(fh, fingerprint=fp, valid=np.asarray(valid),
                     ids=np.asarray(ids), **arrs)
        os.replace(tmp, cache_path)  # atomic: a crash never half-writes
        print(f"cmhse-serve: gallery cached to {cache_path}")
    return encoded


def build_context(checkpoint: str, data_path: str | None, split: str,
                  vocab_path: str | None = None, sharded: bool = False,
                  quantized: bool = False,
                  rescore_m: int | None = None,
                  gallery_cache: str | None = None,
                  auth_token: str | None = None,
                  allow_any_path: bool = False,
                  compact_threshold: float | None = 0.5,
                  batch_window_ms: float = 0.0) -> dict:
    """Load the checkpoint, encode the video-side gallery (or restore it
    from ``gallery_cache``), and assemble the request-handling context
    (the text-side gallery for video->paragraph queries is built lazily
    on first use).

    ``auth_token``/``allow_any_path``: the trust model (module docstring).
    ``compact_threshold``: auto-compact both galleries when a remove
    leaves the invalid-row fraction above this (None disables)."""
    import threading
    from cmhse_tpu.data import PrecompDataset, Vocabulary
    from cmhse_tpu.data.vocab import find_vocab
    from cmhse_tpu.eval.serve import Retriever
    from cmhse_tpu.train.checkpoint import restore_for_eval

    model, params, cfg = restore_for_eval(checkpoint)
    data_path = data_path or cfg.data.data_path
    vocab = Vocabulary.load(find_vocab(data_path, vocab_path))
    dataset = PrecompDataset(data_path, split, vocab,
                             feat_dim=cfg.data.feat_dim,
                             flat=not cfg.model.hierarchical)
    mesh = None
    if sharded:
        from cmhse_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((-1,), ("data",))

    # ONE encode pass yields both modalities; the text-side Retriever
    # (video->paragraph queries) is built lazily from the same tuple
    encoded = _load_or_encode_gallery(model, params, dataset, cfg,
                                      gallery_cache, checkpoint)
    retriever = Retriever(model, params, mesh=mesh, quantize=quantized,
                          rescore_m=rescore_m)
    retriever.build_gallery(side="video", encoded=encoded)
    # the lazy text side needs only the TEXT embeddings (+ validity/ids):
    # closing over the full tuple also pinned the startup VIDEO embedding
    # copy for the daemon's lifetime, so video-side compaction never
    # actually reclaimed the startup rows' memory (review r5). The closure
    # is dropped once consumed (see the video_key branch); an UNUSED text
    # side necessarily keeps the startup text encode resident — that is
    # exactly what a later video_key build needs — and --warm trades that
    # by building both directions up front.
    _, p_emb, enc_valid, enc_ids = encoded
    del encoded

    def build_text_side():
        r = Retriever(model, params, mesh=mesh, quantize=quantized,
                      rescore_m=rescore_m)
        r.build_gallery(side="text",
                        encoded=(None, p_emb, enc_valid, enc_ids))
        return r

    ctx = {
        "cfg": cfg,
        "vocab": vocab,
        "dataset": dataset,
        # every split backing the gallery, in ingest order: the startup
        # split plus each live-added one (video_key queries resolve here)
        "datasets": [dataset],
        "data_path": data_path,
        # unified key table: startup split rows first, live-added items
        # appended behind them (gallery_keys index into THIS, not dataset)
        "keys": list(dataset.keys),
        # incrementally-maintained views of the key table, so remove and
        # the add dup-check are O(request), not O(gallery): every live or
        # tombstoned name, and name -> NEWEST row id
        "key_set": set(dataset.keys),
        "key_to_row": {k: i for i, k in enumerate(dataset.keys)},
        "added": [],
        "retriever": retriever,
        "retriever_text": None,
        "removed_ids": [],
        "removed_keys": set(),
        "build_text_side": build_text_side,
        "split": split,
        "served": 0,
        "latencies": deque(maxlen=1024),
        "compactions": 0,
        "compact_threshold": compact_threshold,
        "auth_token": auth_token,
        "allow_any_path": allow_any_path,
        "shutdown": False,
        # request lock + ingest lock (see _handle_add's locking contract)
        "lock": threading.Lock(),
        "ingest_lock": threading.Lock(),
    }
    # cross-connection query micro-batching (prototype; see _QueryBatcher):
    # 0 disables — each query takes the request lock individually
    ctx["batcher"] = (_QueryBatcher(ctx, batch_window_ms / 1e3)
                      if batch_window_ms > 0 else None)
    return ctx


def main(argv=None) -> int:
    p = argparse.ArgumentParser("cmhse-serve")
    p.add_argument("checkpoint", help="checkpoint dir (with config.json)")
    p.add_argument("--socket", default=None, metavar="PATH",
                   help="unix socket path to listen on")
    p.add_argument("--tcp", default=None, metavar="HOST:PORT",
                   help="TCP address to listen on instead of a unix socket "
                        "(e.g. 127.0.0.1:7700; port 0 picks an ephemeral "
                        "one). There is no authentication by default — "
                        "bind loopback or a firewalled interface, or set "
                        "--auth_token")
    p.add_argument("--data_path", default=None)
    p.add_argument("--split", default="val", help="gallery split")
    p.add_argument("--sharded", action="store_true")
    p.add_argument("--quantized", action="store_true",
                   help="two-stage int8 serving (million-row galleries)")
    p.add_argument("--rescore_m", type=int, default=None)
    p.add_argument("--vocab_path", default=None)
    p.add_argument("--gallery_cache", default=None, metavar="PATH",
                   help="persist the startup gallery encode to this .npz "
                        "and reuse it on restart while the checkpoint and "
                        "split files are unchanged (encode-once across "
                        "restarts)")
    p.add_argument("--log_jsonl", default=None, metavar="PATH",
                   help="append one JSONL record per request (op, ok, "
                        "latency_ms, ...) — the serving counterpart of the "
                        "train loop's log.jsonl")
    p.add_argument("--warm", action="store_true",
                   help="build the video->paragraph side and compile both "
                        "query paths before accepting clients, so the "
                        "first real request doesn't pay the lazy build + "
                        "jit cost")
    p.add_argument("--auth_token", default=None, metavar="TOKEN",
                   help="require every request to carry a matching "
                        "'token' field (constant-time compare); without "
                        "this, anyone who can reach the socket can query, "
                        "mutate the gallery, and shut the daemon down")
    p.add_argument("--allow_any_path", action="store_true",
                   help="let {'op': 'add'} open splits OUTSIDE the startup "
                        "--data_path root (the daemon opens those files "
                        "server-side; confined by default)")
    p.add_argument("--compact_threshold", type=float, default=0.5,
                   metavar="FRAC",
                   help="auto-compact the gallery when a remove leaves "
                        "more than this fraction of rows tombstoned "
                        "(reclaims memory + GEMM; <= 0 disables; "
                        "default 0.5)")
    p.add_argument("--max_connections", type=int, default=None, metavar="N",
                   help="refuse new connections beyond N concurrent "
                        "clients (each holds a thread); default unlimited")
    p.add_argument("--batch_window_ms", type=float, default=0.0,
                   metavar="MS",
                   help="merge text queries arriving from DIFFERENT "
                        "connections within MS milliseconds into one "
                        "device call (adds up to MS latency per query, "
                        "multiplies concurrent-client throughput); "
                        "0 disables (default)")
    from cmhse_tpu.utils.compile_cache import add_cli_flag

    add_cli_flag(p, "A restarted daemon — or one whose executable caches "
                    "were dropped by the map-count guard — re-warms its "
                    "query buckets from disk in seconds instead of "
                    "recompiling under the request lock.")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args(argv)
    if (args.socket is None) == (args.tcp is None):
        p.error("pass exactly one of --socket / --tcp")
    tcp = None
    if args.tcp is not None:
        host, _, port = args.tcp.rpartition(":")
        if not host or not port.isdigit() or ":" in host or "[" in host:
            p.error(f"--tcp wants an IPv4 HOST:PORT (or a resolvable "
                    f"hostname), got {args.tcp!r}")
        tcp = (host, int(port))

    # bind BEFORE the startup gallery encode: a taken port/socket-path (the
    # classic restart-while-old-daemon-lives mistake) must fail in
    # milliseconds, not after minutes of encoding
    try:
        server = _bind_unix(args.socket) if args.socket is not None \
            else _bind_tcp(*tcp)
    except OSError as e:
        p.error(f"cannot listen on "
                f"{args.socket or args.tcp}: {e}")

    from cmhse_tpu.cli.train import _force_platform

    _force_platform(args.platform)
    # single-process daemon: safe per CLAUDE.md (the deserialized-
    # executable hang is multi-PROCESS only; enable_compile_cache refuses
    # by itself if a distributed client is somehow live). Must run BEFORE
    # build_context — the startup encode and --warm compiles are exactly
    # the programs worth persisting.
    from cmhse_tpu.utils.compile_cache import enable_from_cli

    enable_from_cli(args.compile_cache, "cmhse-serve")
    try:
        ctx = build_context(args.checkpoint, args.data_path, args.split,
                            vocab_path=args.vocab_path, sharded=args.sharded,
                            quantized=args.quantized,
                            rescore_m=args.rescore_m,
                            gallery_cache=args.gallery_cache,
                            auth_token=args.auth_token,
                            allow_any_path=args.allow_any_path,
                            compact_threshold=(args.compact_threshold
                                               if args.compact_threshold > 0
                                               else None),
                            batch_window_ms=args.batch_window_ms)
        if args.warm:
            # one throwaway request per direction: triggers the lazy
            # text-side gallery build and jit-compiles both query paths;
            # stats are reset so clients see only their own traffic.
            # (carries the auth token — warm-up is a first-class request)
            tok = {"token": args.auth_token} if args.auth_token else {}
            _handle_request({"query": "warm up the encoder", "k": 1, **tok},
                            ctx)
            if args.batch_window_ms > 0:
                # with the batcher on, merged windows run at power-of-two
                # batch buckets (see _text_retrieve) — compile them now so
                # the first busy window doesn't stall serving on XLA
                for nb in (2, 4, 8):
                    _handle_request(
                        {"query": ["warm up the encoder"] * nb, "k": 1,
                         **tok}, ctx)
            if ctx["dataset"].keys:
                _handle_request(
                    {"video_key": ctx["dataset"].keys[0], "k": 1, **tok},
                    ctx)
            ctx["served"] = 0
            ctx["latencies"].clear()
            print("cmhse-serve warm: both directions built and compiled")
        if args.log_jsonl:
            from cmhse_tpu.utils.logging import JsonlLogger

            ctx["logger"] = JsonlLogger(args.log_jsonl, tensorboard=False)
    except BaseException:
        import os

        server.close()
        if args.socket is not None and os.path.exists(args.socket):
            os.unlink(args.socket)
        raise
    try:
        serve_forever(ctx, args.socket, tcp=tcp, server=server,
                      max_connections=args.max_connections)
    finally:
        if ctx.get("logger") is not None:
            ctx["logger"].close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
