"""bench.py harness smoke (CPU, toy shapes): the driver runs bench.py
unattended at round end, so structural breakage in the timing harness must
surface here, not there. Full-size numbers are TPU-only (PERFORMANCE.md).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root module, after the path insert)


def test_topk_bench_variants_produce_finite_qps():
    out = bench.bench_topk_100k(n=512, q=8, k=3)
    assert set(out) == {"stream", "stream_prepared", "dense"}
    for name, qps in out.items():
        assert np.isfinite(qps) and qps > 0, (name, qps)


def test_topk_standalone_bench_produces_finite_qps():
    qps, ms = bench.bench_topk_standalone(n=512, q=8, k=3, reps=2)
    assert set(qps) == set(ms) == {"stream_prepared"}
    assert np.isfinite(qps["stream_prepared"]) and qps["stream_prepared"] > 0
    assert ms["stream_prepared"] > 0


def test_acquire_device_returns_on_cpu():
    # under the test conftest the platform is CPU, so first contact is
    # immediate; the watchdog must pass the device through untouched
    dev = bench._acquire_device(timeout_s=60)
    assert dev.platform == "cpu"


def test_analytic_flops_positive():
    f = bench.analytic_encode_flops_per_pair()
    assert f > 1e9  # multi-GFLOP model; guards accidental unit slips


def test_main_emits_one_json_line_on_fast_device_failure(monkeypatch,
                                                         capsys):
    # a down tunnel can also fail FAST (connection refused / PJRT init
    # error) instead of hanging; main() must still print exactly one
    # null-valued JSON line, not a bare traceback
    import json

    def boom(*a, **k):
        raise RuntimeError("connection refused by relay")

    monkeypatch.setattr(bench, "_acquire_device", boom)
    bench.main()
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1
    back = json.loads(lines[0])
    assert back["value"] is None
    assert "connection refused" in back["extras"]["error"]


def test_tunnel_down_result_is_one_honest_json_line():
    # the driver records bench.py's single JSON line even when the TPU
    # tunnel is down for the whole round-end window; the fallback must be
    # (a) parseable, (b) null-valued (never a stale number as "value"),
    # (c) explicit about where any quoted number came from
    import json

    res = bench._tunnel_down_result(TimeoutError("tunnel down"))
    line = json.dumps(res)  # must serialize
    back = json.loads(line)
    assert back["value"] is None and back["vs_baseline"] is None
    assert "tunnel down" in back["extras"]["error"]
    prev = back["extras"]["last_measured_NOT_this_run"]
    # this repo carries BENCH_r01/r02 with measured values, so the fallback
    # should surface the newest one — labeled, not substituted
    assert prev is not None and prev["round_file"].startswith("BENCH_r")
    assert prev["value"] > 0


def _bench_result(value, train=None, topk=None, mfu_dev=None):
    extras = {"train_pairs_per_sec": train, "topk_qps_100k": topk,
              "mfu_device": mfu_dev}
    return {"value": value, "unit": "pairs/sec", "extras": extras}


def test_regression_tripwire_flags_big_drops_only(tmp_path):
    """VERDICT r3 weak 4: metrics down >10% vs the newest prior
    BENCH_r*.json are flagged; in-band jitter and missing metrics are
    not."""
    import json

    prev = _bench_result(23000.0, train=6600.0,
                         topk={"stream": 300000.0, "dense": 200000.0},
                         mfu_dev=0.88)
    # the driver wraps the bench line as {"cmd": ..., "parsed": {...}}
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"cmd": "python bench.py", "parsed": prev}))

    now = _bench_result(22000.0,            # -4.3%: inside the band
                        train=5000.0,       # -24%: REAL regression
                        topk={"stream": 310000.0,   # improved
                              "dense": 150000.0},   # -25%: regression
                        mfu_dev=None)       # failed sub-bench: skipped
    rep = bench.regressions_vs_previous(now, here=str(tmp_path))
    assert rep["vs"] == "BENCH_r03.json" and rep["threshold_pct"] == 10
    flagged = {f["metric"]: f for f in rep["flagged"]}
    assert set(flagged) == {"train_pairs_per_sec", "topk_qps_100k.dense"}
    assert flagged["train_pairs_per_sec"]["drop_pct"] == 24.2
    assert flagged["topk_qps_100k.dense"]["now"] == 150000.0


def test_regression_tripwire_picks_newest_measured_round(tmp_path):
    """Null rounds (tunnel down) are skipped; the newest round with a
    measured value is the comparison base. No prior file -> None."""
    import json

    assert bench.regressions_vs_previous(_bench_result(100.0),
                                         here=str(tmp_path)) is None

    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": _bench_result(20000.0)}))
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"parsed": {"value": None, "extras": {}}}))
    rep = bench.regressions_vs_previous(_bench_result(15000.0),
                                        here=str(tmp_path))
    assert rep["vs"] == "BENCH_r02.json"
    assert [f["metric"] for f in rep["flagged"]] == ["pairs_per_sec"]
