"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json:2): video-paragraph pairs/sec encoded through
the flagship hierarchical model on the real TPU chip, plus sim-matrix QPS
against a 10k gallery as an extra.

Measurement design (important on this image): the TPU is reached through a
relay that (a) memoizes executions with identical arguments and (b) reports
buffers ready before chained work completes, so naive call loops measure
nothing. We instead put the benchmark loop IN-GRAPH: a ``lax.scan`` whose
body perturbs the input per step (defeats memoization, keeps work serial)
and reduces to one scalar (one tiny host fetch forces completion). Timing
at two scan lengths and taking the slope cancels the fixed dispatch +
transfer overhead.

``vs_baseline``: the reference never published throughput (BASELINE.md:22)
and the reference mount is still empty, so the denominator is an ESTIMATE:
a 2018-era single-GPU PyTorch run of 4 stacked cuDNN GRUs (H=1024) over
~8 clips x 64 frames per video at batch 64 sustains on the order of 150
video-paragraph pairs/sec end-to-end. Half-grounded by measurement in r5:
the torch replica of the reference model measures 12.95 pairs/s on ONE
CPU core of this host at the exact headline shape
(scripts/torch_replica_baseline.py; BASELINE.md "Measured replica
anchor"), so 150 assumes a 2018 GPU ~11.6x one modern core — the
conservative end of the published 10-100x range for cuDNN GRU workloads.
Replace EST_REF_PAIRS_PER_SEC with a measured number when the reference
becomes runnable.
"""

from __future__ import annotations

import json
import time

import numpy as np

EST_REF_PAIRS_PER_SEC = 150.0  # documented estimate; see module docstring

# realistic headline shapes (ActivityNet-scale; SURVEY.md section 7)
BATCH = 128
MAX_CLIPS = 8
MAX_FRAMES = 64
MAX_SENTENCES = 8
MAX_WORDS = 32
FEAT_DIM = 500
EMBED = 1024
HIDDEN = 1024
WORD_DIM = 300
VOCAB = 10000

SCAN_SHORT = 8
SCAN_LONG = 40  # 32-batch delta (~160 ms) so relay jitter stays under ~10%

GALLERY = 10_000  # sim-matrix QPS gallery size
QUERY_BLOCK = 2048  # large enough that the timed delta dwarfs dispatch jitter


def analytic_encode_flops_per_pair() -> float:
    """Analytic forward FLOPs for ONE video-paragraph pair through the
    headline encode model (hierarchical + attention pooling, H == E so the
    joint-space projection Dense is skipped — see
    cmhse_tpu/models/encoders.py:93).

    Counts matmul FLOPs (2*MACs); elementwise gate math is <2% on top and is
    excluded, so the derived MFU is slightly conservative-in-the-numerator.
    This grounds the headline pairs/sec in hardware terms (VERDICT round 1
    item 8): mfu = pairs/sec * flops_per_pair / peak_flops.
    """
    h3 = 3 * HIDDEN
    attn = 2 * HIDDEN * 256 + 2 * 256  # AttentionPool: Dense(H->256)+Dense(256->1)

    def gru(t, d):  # per-row: input proj + hidden GEMM, t steps
        return t * 2 * h3 * (d + HIDDEN)

    video = (
        MAX_CLIPS * (gru(MAX_FRAMES, FEAT_DIM) + MAX_FRAMES * attn)  # low
        + gru(MAX_CLIPS, EMBED) + MAX_CLIPS * attn                   # high
    )
    text = (
        MAX_SENTENCES * (gru(MAX_WORDS, WORD_DIM) + MAX_WORDS * attn)
        + gru(MAX_SENTENCES, EMBED) + MAX_SENTENCES * attn
    )
    return float(video + text)


# bf16 peak FLOP/s by device_kind; used to self-report MFU next to the
# headline. Unknown kinds fall back to None (mfu omitted, tflops still shown).
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _build_model_and_batch():
    import jax

    from cmhse_tpu.config import ModelConfig
    from cmhse_tpu.data.bucketing import BucketSpec, pad_batch
    from cmhse_tpu.data.datasets import SyntheticHierarchicalDataset
    from cmhse_tpu.models import CMHSE

    mcfg = ModelConfig(
        embed_size=EMBED, word_dim=WORD_DIM, feat_dim=FEAT_DIM,
        rnn_hidden=HIDDEN, hierarchical=True, attention_pool=True,
        dtype="bfloat16",
        # fused Pallas GRU time loop: ~2.8x the scan path on v5e for the
        # dominant low-level encoders (encode is forward-only)
        pallas_gru=True,
    )
    ds = SyntheticHierarchicalDataset(
        num_videos=BATCH, feat_dim=FEAT_DIM, vocab_size=VOCAB,
        max_clips=MAX_CLIPS, max_frames=MAX_FRAMES, max_words=MAX_WORDS,
    )
    spec = BucketSpec(
        batch_size=BATCH, max_clips=MAX_CLIPS, max_frames=MAX_FRAMES,
        max_sentences=MAX_SENTENCES, max_words=MAX_WORDS, feat_dim=FEAT_DIM,
        # bf16 feature ingestion: identical numerics for the bf16 model
        # (inputs are cast immediately), half the feature DMA + convert
        feature_dtype="bfloat16",
    )
    batch = jax.device_put(pad_batch([ds[i] for i in range(BATCH)], spec))
    model = CMHSE(cfg=mcfg, vocab_size=VOCAB)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    return model, params, batch


def _timed_scan(fn_factory, n_iters_pair=(SCAN_SHORT, SCAN_LONG)):
    """Time an in-graph scan at two lengths; return seconds per iteration
    from the slope (fixed overhead cancels). Every call gets a DISTINCT seed
    argument so the relay's identical-execution memoization never hits."""
    import jax.numpy as jnp

    seed = iter(range(1, 1000))

    def call(fn, s, attempts=3):
        """Returns (value, retried): the relay occasionally drops a response
        mid-body; retry transient failures so unattended driver runs survive.
        ``retried`` lets timed callers DISCARD the measurement — the backoff
        sleep would otherwise land inside the timed region and corrupt the
        slope (ADVICE.md round 1)."""
        for i in range(attempts):
            try:
                return float(fn(jnp.float32(s))), i > 0
            except Exception:
                if i == attempts - 1:
                    raise
                time.sleep(5 * (i + 1))

    n0, n1 = n_iters_pair
    fn0, fn1 = fn_factory(n0), fn_factory(n1)
    call(fn0, next(seed))  # compile
    call(fn1, next(seed))
    slopes = []
    attempts_left = 10  # bound re-measurement when the relay keeps dropping
    while len(slopes) < 3 and attempts_left > 0:  # median-of-3 clean slopes
        attempts_left -= 1
        t0 = time.perf_counter()
        _, r0 = call(fn0, next(seed))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, r1 = call(fn1, next(seed))
        tb = time.perf_counter() - t0
        if r0 or r1:
            continue  # a retry's sleep landed in ta/tb: re-measure this pair
        slopes.append((tb - ta) / (n1 - n0))
    if not slopes:
        raise RuntimeError("relay too flaky: no clean timing pair in 10 tries")
    slope = sorted(slopes)[len(slopes) // 2]
    return max(slope, 1e-12)


def bench_encode_pairs():
    import jax
    import jax.numpy as jnp

    model, params, batch = _build_model_and_batch()

    def factory(n_iters):
        @jax.jit
        def run(seed):
            def body(carry, i):
                # perturb frames per step: new work every iteration, same
                # shapes (cast so bf16 frames are not promoted back to f32)
                b = batch.replace(
                    frames=batch.frames
                    + ((seed + i.astype(jnp.float32)) * 1e-3).astype(
                        batch.frames.dtype
                    )
                )
                out = model.apply({"params": params}, b)
                s = jnp.sum(out.video_emb.astype(jnp.float32)) + jnp.sum(
                    out.para_emb.astype(jnp.float32)
                )
                return carry + s, None
            total, _ = jax.lax.scan(body, 0.0, jnp.arange(n_iters))
            return total
        return run

    sec_per_batch = _timed_scan(factory)
    return BATCH / sec_per_batch


def _build_train_parts(bsz: int = 64):
    """Flagship TRAIN-shape setup, shared by bench_train_step and
    scripts/train_breakdown.py so the probes always measure exactly the
    headline configuration. Returns (cfg, model, params0, tx, opt0, batch,
    bsz)."""
    import jax

    from cmhse_tpu.config import (DataConfig, ExperimentConfig, LossConfig,
                                  ModelConfig, TrainConfig)
    from cmhse_tpu.data.bucketing import BucketSpec, pad_batch
    from cmhse_tpu.data.datasets import SyntheticHierarchicalDataset
    from cmhse_tpu.models import CMHSE
    from cmhse_tpu.train.state import make_optimizer

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=bsz, feat_dim=FEAT_DIM, vocab_size=VOCAB,
                        max_clips=MAX_CLIPS, max_frames=MAX_FRAMES,
                        max_sentences=MAX_SENTENCES, max_words=MAX_WORDS),
        model=ModelConfig(embed_size=EMBED, word_dim=WORD_DIM,
                          feat_dim=FEAT_DIM, rnn_hidden=HIDDEN,
                          hierarchical=True, dtype="bfloat16",
                          # gate-saving fused fwd + fused BPTT backward:
                          # 2.3x the scan train step (PERFORMANCE.md)
                          pallas_gru=True),
        loss=LossConfig(),
        train=TrainConfig(),
    )
    ds = SyntheticHierarchicalDataset(
        num_videos=bsz, feat_dim=FEAT_DIM, vocab_size=VOCAB,
        max_clips=MAX_CLIPS, max_frames=MAX_FRAMES, max_words=MAX_WORDS,
    )
    spec = BucketSpec(batch_size=bsz, max_clips=MAX_CLIPS,
                      max_frames=MAX_FRAMES, max_sentences=MAX_SENTENCES,
                      max_words=MAX_WORDS, feat_dim=FEAT_DIM,
                      feature_dtype="bfloat16")
    batch = jax.device_put(pad_batch([ds[i] for i in range(bsz)], spec))
    model = CMHSE(cfg=cfg.model, vocab_size=VOCAB)
    params0 = model.init(jax.random.PRNGKey(0), batch)["params"]
    tx = make_optimizer(cfg)
    opt0 = tx.init(params0)
    return cfg, model, params0, tx, opt0, batch, bsz


def bench_train_step():
    """Training pairs/sec: full forward+loss+backward+Adam, scanned in-graph
    (params/opt-state threaded through the scan carry)."""
    import jax
    import jax.numpy as jnp
    import optax

    from cmhse_tpu.train.objective import total_loss

    cfg, model, params0, tx, opt0, batch, bsz = _build_train_parts()

    def factory(n_iters):
        @jax.jit
        def run(seed):
            def step(carry, i):
                params, opt_state = carry
                b = batch.replace(
                    frames=batch.frames
                    + ((seed + i.astype(jnp.float32)) * 1e-3).astype(
                        batch.frames.dtype
                    )
                )

                def loss_fn(p):
                    out = model.apply({"params": p}, b)
                    l, _ = total_loss(out, b, cfg.loss)
                    return l

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, _), losses = jax.lax.scan(
                step, (params0, opt0), jnp.arange(n_iters)
            )
            return jnp.sum(losses) + jnp.sum(
                jax.tree.leaves(params)[0].astype(jnp.float32)
            )

        return run

    sec_per_step = _timed_scan(factory, n_iters_pair=(2, 6))
    return bsz / sec_per_step


def bench_sim_qps():
    """Queries/sec ranked against a 10k-item gallery (eval/serving hot path)."""
    import jax
    import jax.numpy as jnp

    from cmhse_tpu.ops.ranking import retrieval_ranks

    rng = np.random.RandomState(0)
    gallery = jnp.asarray(rng.randn(GALLERY, EMBED).astype(np.float32))
    queries = jnp.asarray(rng.randn(QUERY_BLOCK, EMBED).astype(np.float32))
    pos = jnp.arange(QUERY_BLOCK, dtype=jnp.int32)

    def factory(n_iters):
        @jax.jit
        def run(seed):
            def body(carry, i):
                q = queries + (seed + i.astype(jnp.float32)) * 1e-3
                sims = jnp.dot(q, gallery.T,
                               preferred_element_type=jnp.float32)
                ranks = retrieval_ranks(sims, pos)
                return carry + jnp.sum(ranks).astype(jnp.float32), None
            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iters))
            return total
        return run

    sec_per_block = _timed_scan(factory, n_iters_pair=(100, 500))
    return QUERY_BLOCK / sec_per_block


def bench_rank_counts_100k():
    """Large-gallery ranking at a 100k-item gallery (VERDICT round 1 item 3's
    bench leg): the streaming Pallas rank-count kernel vs the dense [Q, N]
    rank path, at BOTH multiply precisions — XLA's default f32 jnp.dot on
    TPU uses bf16 multiplies, so "dense default" and "stream f32" are not
    the same arithmetic. The dense path materializes 400 MB of similarities
    per call (and [N, N] = 40 GB would be impossible for full-gallery eval
    at this size); the streaming kernel writes only [Q] counts.
    Returns dict of QPS per variant."""
    import jax
    import jax.numpy as jnp

    from cmhse_tpu.ops.pallas_sim import pallas_rank_counts
    from cmhse_tpu.ops.ranking import retrieval_ranks

    n, q = 100_000, 1024
    rng = np.random.RandomState(1)
    # the gallery MUST be a jit ARGUMENT, not a closed-over constant: a
    # 400 MB constant ships inside the compile request and trips the relay's
    # HTTP 413 size cap (PERFORMANCE.md pitfall 6)
    gallery = jax.device_put(rng.randn(n, EMBED).astype(np.float32))
    queries = jax.device_put(
        np.asarray(gallery[:q]) + 0.1 * rng.randn(q, EMBED).astype(np.float32)
    )
    pos = jnp.arange(q, dtype=jnp.int32)

    def factory_stream(precision):
        def make(n_iters):
            @jax.jit
            def run(seed, qs, gal):
                def body(carry, i):
                    qq = qs + (seed + i.astype(jnp.float32)) * 1e-3
                    pos_score = jnp.sum(
                        qq.astype(jnp.float32) * gal[:q].astype(jnp.float32),
                        axis=1,
                    )
                    ranks = pallas_rank_counts(qq, gal, pos_score,
                                               pos_idx=pos,
                                               precision=precision)
                    return carry + jnp.sum(ranks).astype(jnp.float32), None
                total, _ = jax.lax.scan(body, jnp.float32(0),
                                        jnp.arange(n_iters))
                return total
            return lambda seed: run(seed, queries, gallery)
        return make

    def factory_dense(precision):
        def make(n_iters):
            @jax.jit
            def run(seed, qs, gal):
                def body(carry, i):
                    qq = qs + (seed + i.astype(jnp.float32)) * 1e-3
                    sims = jnp.dot(qq, gal.T,
                                   preferred_element_type=jnp.float32,
                                   precision=precision)
                    ranks = retrieval_ranks(sims, pos)
                    return carry + jnp.sum(ranks).astype(jnp.float32), None
                total, _ = jax.lax.scan(body, jnp.float32(0),
                                        jnp.arange(n_iters))
                return total
            return lambda seed: run(seed, queries, gallery)
        return make

    out = {}
    for name, fac in (
        ("stream_f32", factory_stream("float32")),
        ("stream_bf16mult", factory_stream("bfloat16")),
        ("dense_bf16mult", factory_dense(None)),  # XLA default on TPU
        ("dense_f32", factory_dense(jax.lax.Precision.HIGHEST)),
    ):
        out[name] = q / _timed_scan(fac, n_iters_pair=(10, 50))
    return out


def bench_mfu_device(n_steps: int = 3):
    """Device-time-grounded MFU for the headline encode shape (VERDICT r2
    weak 1): run ``n_steps`` profiled encode batches, parse the xplane
    trace's TPU compute line, and divide analytic FLOPs by MEASURED device
    busy time. Unlike the slope-derived ``mfu`` (which flatters via relay
    execution pipelining), this is the number an MFU claim should quote.
    Returns (mfu_device, device_ms_per_batch); raises off-TPU."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from cmhse_tpu.utils.profiling import device_busy_seconds

    model, params, batch = _build_model_and_batch()

    @jax.jit
    def encode_once(seed):
        b = batch.replace(
            frames=batch.frames + (seed * 1e-3).astype(batch.frames.dtype)
        )
        out = model.apply({"params": params}, b)
        return (jnp.sum(out.video_emb.astype(jnp.float32))
                + jnp.sum(out.para_emb.astype(jnp.float32)))

    float(encode_once(jnp.float32(0.5)))  # compile outside the trace
    trace_dir = tempfile.mkdtemp(prefix="cmhse_mfu_")
    with jax.profiler.trace(trace_dir):
        for i in range(n_steps):
            # distinct seeds: the relay memoizes identical executions; the
            # scalar fetch forces completion inside the trace window
            float(encode_once(jnp.float32(1.0 + i)))
    dev_s = device_busy_seconds(trace_dir)
    if dev_s <= 0:
        raise RuntimeError("empty device timeline in profile")
    flops = n_steps * BATCH * analytic_encode_flops_per_pair()
    dev = jax.devices()[0]
    peak = PEAK_BF16_FLOPS.get(getattr(dev, "device_kind", ""), None)
    mfu_dev = (flops / dev_s / peak) if peak else None
    return mfu_dev, dev_s / n_steps * 1e3


def bench_topk_100k(n=100_000, q=1024, k=10):
    """Serving top-k at a 100k gallery (VERDICT r2 next-step 2's bench leg):
    the chunked-scan streaming path (peak block [Q, chunk]) vs the dense
    [Q, N] masked top_k, plus the prepared-gallery serving path
    (encode-once/serve-forever: pad/chunk/bf16-convert hoisted out of the
    query path). Returns dict of QPS per variant. The size parameters exist
    so the harness itself is CPU-smoke-testable at toy shapes
    (tests/test_bench_harness.py); the driver always runs the defaults."""
    import jax
    import jax.numpy as jnp

    from cmhse_tpu.ops.topk import prepare_topk_gallery, streaming_sim_topk
    rng = np.random.RandomState(2)
    gallery = jax.device_put(rng.randn(n, EMBED).astype(np.float32))
    queries = jax.device_put(rng.randn(q, EMBED).astype(np.float32))
    prepared = jax.jit(prepare_topk_gallery)(gallery)
    jax.block_until_ready(prepared)

    def dense_topk(qq, gal):
        sims = jnp.dot(qq, gal.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(sims, k)

    def make_factory(operand, topk_fn):
        """Shared seed-perturb/scan/carry harness; variants differ only in
        the gallery operand and the top-k entry point."""
        def factory(n_iters):
            @jax.jit
            def run(seed, qs, gal):
                def body(carry, i):
                    qq = qs + (seed + i.astype(jnp.float32)) * 1e-3
                    s, idx = topk_fn(qq, gal)
                    return carry + jnp.sum(s) + jnp.sum(idx).astype(
                        jnp.float32), None
                total, _ = jax.lax.scan(body, jnp.float32(0),
                                        jnp.arange(n_iters))
                return total
            return lambda seed: run(seed, queries, operand)
        return factory

    stream_topk = lambda qq, gal: streaming_sim_topk(qq, gal, k)
    variants = {
        "stream": make_factory(gallery, stream_topk),
        "stream_prepared": make_factory(prepared, stream_topk),
        "dense": make_factory(gallery, dense_topk),
    }
    return {name: q / _timed_scan(f, n_iters_pair=(10, 50))
            for name, f in variants.items()}


def bench_topk_standalone(n=100_000, q=1024, k=10, reps=8):
    """Per-REQUEST serving top-k: the STANDALONE jitted call that
    ``Retriever._search`` actually dispatches per request, timed by
    device-busy seconds from a profiler trace (VERDICT r4 weak 1 /
    missing 2: every in-scan QPS number above rides `_timed_scan`'s
    timing loop, and XLA compiles a standalone program differently —
    before the round-5 unroll fix the standalone form was ~2x slower at
    1M than the in-scan form; this leg keeps the honest per-request
    number in every future BENCH file). Device-busy timing because the
    relay reports ``block_until_ready`` early for one-shot calls
    (CLAUDE.md); off-TPU (CPU smoke) falls back to wall clock on the
    local backend. Fresh query args per rep defeat relay memoization.

    Returns ``({variant: QPS}, {variant: per-call ms})`` — QPS feeds the
    regression tripwire; ms is timing-flavored and kept out of it."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from cmhse_tpu.ops.topk import prepare_topk_gallery, streaming_sim_topk
    from cmhse_tpu.utils.profiling import device_busy_seconds

    rng = np.random.RandomState(3)
    gallery = jax.device_put(rng.randn(n, EMBED).astype(np.float32))
    prepared = jax.jit(prepare_topk_gallery)(gallery)
    queries = jax.device_put(
        rng.randn(reps + 1, q, EMBED).astype(np.float32))
    jax.block_until_ready((prepared, queries))
    # warm: compile the standalone program outside the timed window
    jax.block_until_ready(streaming_sim_topk(queries[0], prepared, k=k))
    on_tpu = jax.devices()[0].platform == "tpu"
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        with jax.profiler.trace(td):
            acc = jnp.float32(0)
            for r in range(reps):
                s, i = streaming_sim_topk(queries[1 + r], prepared, k=k)
                acc = acc + s.sum() + i.sum().astype(jnp.float32)
            float(acc)  # one host fetch forces the chain to completion
        busy = (device_busy_seconds(td) if on_tpu
                else time.perf_counter() - t0)
    return ({"stream_prepared": q * reps / busy},
            {"stream_prepared": busy / reps * 1e3})


def _host_cpu_fingerprint() -> str:
    """md5 of machine arch + /proc/cpuinfo feature flags, 12 hex chars —
    the namespace key for XLA:CPU persistent-cache entries (the cache key
    omits host CPU features; loading an AOT blob built for a different
    feature set segfaults). The implementation lives in
    ``cmhse_tpu.utils.compile_cache`` (the production CLIs share it);
    kept as an alias because tests/conftest.py imports it from here, so
    bench runs and the suite always share one cache namespace per host."""
    from cmhse_tpu.utils.compile_cache import host_cpu_fingerprint

    return host_cpu_fingerprint()


def _enable_compile_cache():
    """Persistent compilation cache: verified to work through the axon
    remote-compile relay (81s -> 0.5s on a cache hit), so repeated bench
    runs skip the ~10 min of TPU compiles. Delegates to the shared
    package helper (which handles the CPU host-fingerprint subdir and the
    multi-process refusal) with the REPO-LOCAL dir, so bench runs and the
    test suite keep sharing `.jax_cache`."""
    import os

    from cmhse_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def _acquire_device(timeout_s: float = 900.0):
    """First contact with the backend, bounded: through the axon relay
    ``jax.devices()`` BLOCKS INDEFINITELY while the TPU tunnel is down
    (observed for 2h+ stretches on this image). An unattended driver run
    must fail loudly instead of hanging past its budget — poll in a daemon
    thread and give the tunnel ``timeout_s`` to come up."""
    import threading

    import jax

    out: list = []

    def probe():
        try:
            out.append(jax.devices()[0])
        except Exception as e:  # surfaced below; the thread must not die mute
            out.append(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not out:
        raise TimeoutError(
            f"jax.devices() did not return within {timeout_s:.0f}s — the "
            "TPU tunnel looks down; re-run bench.py when it recovers"
        )
    if isinstance(out[0], Exception):
        raise out[0]
    return out[0]


def _tunnel_down_result(err: Exception) -> dict:
    """Driver-contract fallback: the driver runs bench.py unattended at round
    end and records exactly one JSON line. When the TPU is unreachable —
    a silent tunnel (TimeoutError from the bounded probe) or a fast
    connection error (whatever jax raised) — we must still emit that line:
    a null value with the failure spelled out, plus the previous round's
    measured value clearly labeled as NOT this run's, instead of crashing
    with no output at all."""
    import os

    last = None
    prev, path = _newest_prior_bench()
    if prev is not None:
        last = {"round_file": os.path.basename(path),
                "value": prev["value"], "unit": prev.get("unit")}
    return {
        "metric": "video-paragraph pairs/sec encoded (hierarchical CMHSE, "
                  f"B={BATCH}, {MAX_CLIPS}x{MAX_FRAMES} frames, bf16)",
        "value": None,
        "unit": "pairs/sec",
        "vs_baseline": None,
        "extras": {
            "error": str(err),
            "platform": "unreachable",
            "last_measured_NOT_this_run": last,
        },
    }


def _newest_prior_bench(here: str | None = None):
    """Newest prior round's parsed ``BENCH_r*.json`` with a measured value,
    as ``(parsed_dict, path)`` — or ``(None, None)``. Rounds are parsed from
    the filename and sorted NUMERICALLY: reverse-lexicographic sorting
    silently breaks past two digits, and a bare reverse glob compares a
    re-run against its own round's already-written file when that is the
    newest on disk (ADVICE r4). Self-comparison can't be fully excluded
    (bench.py doesn't know its round number — the driver writes the file
    AFTER the run, so at driver time the newest file IS the prior round);
    ``BENCH_SKIP_ROUNDS_FROM`` (env, int) lets a manual re-run pin the
    current round and skip its own and later files."""
    import glob
    import os
    import re

    here = here or os.path.dirname(os.path.abspath(__file__))
    skip_from = os.environ.get("BENCH_SKIP_ROUNDS_FROM")
    try:
        # tolerate "r6"-style values; a malformed var must NEVER raise —
        # this runs unwrapped on the tunnel-down path and a crash here
        # would break the one-JSON-line driver contract (CLAUDE.md)
        skip_from = int(skip_from.lstrip("rR")) if skip_from else None
    except ValueError:
        skip_from = None
    rounds = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(path))
        if m:
            rounds.append((int(m.group(1)), path))
    for n, path in sorted(rounds, reverse=True):
        if skip_from is not None and n >= skip_from:
            continue
        try:
            with open(path) as f:
                cand = json.load(f)
            # the driver wraps our line: {"cmd": ..., "parsed": {<result>}}
            cand = cand.get("parsed", cand) or {}
            if cand.get("value") is not None:
                return cand, path
        except Exception:
            continue
    return None, None


def _flatten_bench_metrics(result: dict) -> dict:
    """Higher-is-better numeric metrics of one bench result, flattened to
    dotted names. ``value`` is the headline pairs/sec; nested QPS dicts
    flatten one level. Timing-flavored extras (ms/batch) are skipped —
    their regressions surface through mfu_device."""
    out = {}
    if isinstance(result.get("value"), (int, float)):
        out["pairs_per_sec"] = float(result["value"])
    extras = result.get("extras") or {}
    for key in ("train_pairs_per_sec", "sim_matrix_qps_10k_gallery",
                "mfu", "mfu_device"):
        v = extras.get(key)
        if isinstance(v, (int, float)):
            out[key] = float(v)
    for group in ("rank_qps_100k", "topk_qps_100k",
                  "topk_standalone_qps_100k"):
        sub = extras.get(group)
        if isinstance(sub, dict):
            for k, v in sub.items():
                if isinstance(v, (int, float)):
                    out[f"{group}.{k}"] = float(v)
    return out


def regressions_vs_previous(result: dict, here: str | None = None,
                            threshold: float = 0.10) -> dict | None:
    """Perf-regression tripwire (VERDICT r3 weak 4): compare this run's
    metrics against the newest prior ``BENCH_r*.json`` and flag any metric
    down more than ``threshold`` (fractional). Run-to-run jitter on this
    image sits inside +-10% (PERFORMANCE.md "Measurement pitfalls" — e.g.
    encode 20.5-26.5k band); a flagged entry therefore means a REAL
    regression to investigate, not noise. Returns ``None`` when no prior
    round file with a measured value exists; otherwise
    ``{"vs": <file>, "threshold_pct": 10, "flagged": [...]}`` with one
    entry per regressed metric. Metrics missing on either side are skipped
    (a bench that failed and reported null must not mask as a pass OR a
    regression — its absence is visible in the raw extras)."""
    import os

    prev, prev_path = _newest_prior_bench(here)
    if prev is None:
        return None
    prev_file = os.path.basename(prev_path)
    now_m, prev_m = _flatten_bench_metrics(result), _flatten_bench_metrics(prev)
    flagged = []
    for name, p in sorted(prev_m.items()):
        n = now_m.get(name)
        if n is None or p <= 0:
            continue
        if n < p * (1.0 - threshold):
            flagged.append({"metric": name, "prev": p, "now": n,
                            "drop_pct": round(100.0 * (1.0 - n / p), 1)})
    return {"vs": prev_file, "threshold_pct": round(100 * threshold),
            "flagged": flagged}


def main():
    import sys
    import traceback

    _enable_compile_cache()
    try:
        dev = _acquire_device()
    except Exception as err:
        # hang (TimeoutError) or fast failure (connection refused, PJRT
        # init error) — either way the one-JSON-line contract holds
        print(f"TPU unreachable: {type(err).__name__}: {err}",
              file=sys.stderr)
        traceback.print_exc()
        print(json.dumps(_tunnel_down_result(err)))
        return
    platform = dev.platform
    pairs_per_sec = bench_encode_pairs()
    sim_qps = bench_sim_qps()
    try:
        train_pps = bench_train_step()
    except Exception:
        train_pps = None  # training bench is an extra; never fail the run —
        # but NEVER silently (VERDICT round 1 weak item 2)
        print("bench_train_step FAILED (reporting null):", file=sys.stderr)
        traceback.print_exc()
    try:
        rank_qps_100k = {
            k: round(v, 2) for k, v in bench_rank_counts_100k().items()
        }
    except Exception:
        rank_qps_100k = None
        print("bench_rank_counts_100k FAILED (reporting null):",
              file=sys.stderr)
        traceback.print_exc()
    try:
        topk_qps_100k = {
            k: round(v, 2) for k, v in bench_topk_100k().items()
        }
    except Exception:
        topk_qps_100k = None
        print("bench_topk_100k FAILED (reporting null):", file=sys.stderr)
        traceback.print_exc()
    try:
        standalone_qps, standalone_ms = bench_topk_standalone()
        standalone_qps = {k: round(v, 2) for k, v in standalone_qps.items()}
        standalone_ms = {k: round(v, 3) for k, v in standalone_ms.items()}
    except Exception:
        standalone_qps = standalone_ms = None
        print("bench_topk_standalone FAILED (reporting null):",
              file=sys.stderr)
        traceback.print_exc()
    mfu_device = device_ms_per_batch = None
    if platform == "tpu":
        try:
            mfu_device, device_ms_per_batch = bench_mfu_device()
        except Exception:
            print("bench_mfu_device FAILED (reporting null):",
                  file=sys.stderr)
            traceback.print_exc()

    # hardware-grounded self-report: analytic FLOPs -> achieved TFLOP/s -> MFU
    flops_per_pair = analytic_encode_flops_per_pair()
    achieved_flops = pairs_per_sec * flops_per_pair
    peak = PEAK_BF16_FLOPS.get(getattr(dev, "device_kind", ""), None)
    result = {
        "metric": "video-paragraph pairs/sec encoded (hierarchical CMHSE, "
                  f"B={BATCH}, {MAX_CLIPS}x{MAX_FRAMES} frames, bf16)",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec",
        "vs_baseline": round(pairs_per_sec / EST_REF_PAIRS_PER_SEC, 2),
        "extras": {
            "sim_matrix_qps_10k_gallery": round(sim_qps, 2),
            "train_pairs_per_sec": round(train_pps, 2) if train_pps else None,
            "rank_qps_100k": rank_qps_100k,
            "topk_qps_100k": topk_qps_100k,
            # per-request (standalone-program) serving numbers — what one
            # wire request costs, vs the in-scan forms above
            "topk_standalone_qps_100k": standalone_qps,
            "topk_standalone_ms_100k": standalone_ms,
            "model_gflops_per_pair": round(flops_per_pair / 1e9, 2),
            "achieved_tflops_per_sec": round(achieved_flops / 1e12, 2),
            "mfu": round(achieved_flops / peak, 3) if peak else None,
            # device-time-grounded MFU from the xplane profile (the honest
            # number; the slope "mfu" above includes relay pipelining
            # flattery — see PERFORMANCE.md "Measurement pitfalls")
            "mfu_device": round(mfu_device, 3) if mfu_device else None,
            "encode_device_ms_per_batch": (
                round(device_ms_per_batch, 2) if device_ms_per_batch
                else None
            ),
            "device_kind": getattr(dev, "device_kind", "unknown"),
            "platform": platform,
            "baseline_note": "reference throughput unpublished; denominator "
                             "is the documented estimate "
                             f"{EST_REF_PAIRS_PER_SEC} pairs/s",
        },
    }
    try:
        result["extras"]["regressions"] = regressions_vs_previous(result)
    except Exception:
        # the tripwire must never take down the one-JSON-line contract
        print("regressions_vs_previous FAILED (reporting null):",
              file=sys.stderr)
        traceback.print_exc()
        result["extras"]["regressions"] = None
    print(json.dumps(result))


if __name__ == "__main__":
    main()
