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
