"""Logging/meters (SURVEY.md C14) and the timing harness."""

import json

import jax.numpy as jnp

from cmhse_tpu.utils.logging import AverageMeter, JsonlLogger, LogCollector
from cmhse_tpu.utils.timing import Timer, throughput


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.val == 3.0 and m.count == 2
    m.update(10.0, n=2)
    assert m.count == 4 and m.sum == 24.0
    assert "10.0000" in str(m)


def test_log_collector_format():
    c = LogCollector()
    c.update("loss", 0.5)
    c.update("loss", 1.5)
    c.update("lr", 0.01)
    s = str(c)
    assert "loss" in s and "lr" in s and "(1.0000)" in s


def test_jsonl_logger_roundtrip(tmp_path):
    path = str(tmp_path / "log.jsonl")
    logger = JsonlLogger(path, tensorboard=False)
    logger.log("train_step", step=1, loss=0.25)
    logger.log("validate", epoch=2, rsum=300.0)
    logger.close()
    lines = [json.loads(line) for line in open(path)]
    assert lines[0]["event"] == "train_step" and lines[0]["loss"] == 0.25
    assert lines[1]["rsum"] == 300.0


def test_jsonl_logger_tensorboard(tmp_path):
    path = str(tmp_path / "log.jsonl")
    logger = JsonlLogger(path, tensorboard=True)
    logger.log("train_step", step=3, loss=0.5)
    logger.close()
    # best-effort: if torch tensorboard is present a tb/ dir exists
    import importlib.util

    if importlib.util.find_spec("torch") is not None:
        assert (tmp_path / "tb").exists()


def test_jsonl_logger_disabled_is_total_noop(tmp_path):
    """enabled=False (non-zero processes on a pod — the log lives on shared
    storage and only process 0 writes it) must not even create the file."""
    from cmhse_tpu.utils.logging import JsonlLogger

    path = tmp_path / "nolog" / "log.jsonl"
    lg = JsonlLogger(str(path), enabled=False)
    lg.log("train_step", step=1, loss=0.5)
    lg.close()
    assert not path.exists() and not path.parent.exists()


def test_timer_and_throughput():
    with Timer() as t:
        sum(range(1000))
    assert t.elapsed > 0

    def f(x):
        return x + 1

    rate = throughput(f, (jnp.zeros((4,)),), iters=3, warmup=1)
    assert rate > 0
