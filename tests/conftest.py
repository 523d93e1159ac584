"""Test env: force CPU with 8 virtual XLA devices BEFORE any jax use.

This is the TPU-world fake backend for multi-device tests (SURVEY.md section
4 item 4): sharded paths must produce identical results to single-device.

The harness image installs a sitecustomize that registers the real-TPU
``axon`` PJRT plugin and force-sets ``jax_platforms="axon,cpu"`` at
interpreter start, ignoring the JAX_PLATFORMS env var — so we must override
via ``jax.config`` after import but before backend initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: repeated suite runs skip recompiles. The CPU
# cache dir is FINGERPRINTED by host CPU features: the cache key does not
# include them, and this repo's rounds run on varying hosts — loading an
# XLA:CPU AOT blob compiled for a different feature set SEGFAULTED the
# suite (cpu_aot_loader warns "could lead to execution errors such as
# SIGILL", then test_train_dp died in backend_compile_and_load). TPU
# (axon) entries keep the flat .jax_cache root — they execute on the
# device, not the host. The fingerprint recipe lives in bench.py (single
# source of truth) so bench runs and the suite share one namespace.

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _host_cpu_fingerprint  # noqa: E402

_cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          ".jax_cache", f"cpu-{_host_cpu_fingerprint()}")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + repr(jax.devices())
)
assert jax.device_count() == 8, jax.devices()

# vm.max_map_count guard: every XLA:CPU executable mmaps its code pages and
# the full suite compiles thousands of programs, so one pytest process
# accumulates memory mappings monotonically. On this image the kernel limit
# is 65530 (/proc/sys/vm/max_map_count); the suite SEGFAULTED inside
# backend_compile_and_load at ~94% with the map count measured at exactly
# 65531 (maps-monitor trace, r4 diagnosis). Dropping jax's executable
# caches unmaps the compiled code; the persistent compile cache above makes
# the later recompiles cheap. Threshold 40k leaves headroom for the largest
# single-test growth observed (~3k maps).

_MAPS_SOFT_LIMIT = 40_000


def _map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return f.read().count(b"\n")
    except OSError:
        return 0


# Two-tier suite (VERDICT r4 weak 6: the default loop was headed past the
# 1-core host's budget): tests marked `slow` — the 2-process
# jax.distributed fit, the batcher-vs-CRUD race, the CRUD/tie fuzzes —
# only run with --runslow (or CMHSE_RUN_SLOW=1, for harnesses that can't
# pass flags). Everything they pin is also covered in miniature by fast
# tests; the full tier is the pre-commit/pre-round gate (see CLAUDE.md).


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (the multi-minute tail: "
             "2-process distributed fit, fuzzes, races)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tail tests; skipped unless "
                   "--runslow or CMHSE_RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    import pytest

    if config.getoption("--runslow") or \
            os.environ.get("CMHSE_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier: pass --runslow or set CMHSE_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def pytest_runtest_teardown(item, nextitem):
    n = _map_count()
    if n >= _MAPS_SOFT_LIMIT:
        import gc
        import sys

        jax.clear_caches()
        gc.collect()
        print(f"\n[conftest] map count {n} >= {_MAPS_SOFT_LIMIT}: cleared "
              f"jax caches -> {_map_count()} maps", file=sys.stderr)
