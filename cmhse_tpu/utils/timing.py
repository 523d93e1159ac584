"""Timing harness for throughput numbers (SURVEY.md section 5 "Tracing"):
``block_until_ready``-fenced walls, plus an optional ``jax.profiler`` trace
context for deep dives."""

from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    """Wall-clock timer that fences device work."""

    def __init__(self) -> None:
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


def throughput(fn, args, iters: int = 20, warmup: int = 3) -> float:
    """Steady-state calls/sec of a jitted fn; fences with block_until_ready."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return iters / (time.perf_counter() - t0)


@contextlib.contextmanager
def profiler_trace(logdir: str | None):
    """``with profiler_trace('/tmp/trace'):`` wraps a region in a JAX
    profiler trace; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
