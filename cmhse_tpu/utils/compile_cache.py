"""Persistent XLA compilation cache for production CLIs (and bench).

Verified to work through the axon remote-compile relay (81 s -> 0.5 s on
a cache hit, bench.py's original measurement), so a restarted daemon (or
one whose in-memory executable caches were dropped by the
``vm.max_map_count`` guard) re-warms its query buckets from disk in
seconds instead of paying multi-second remote compiles under the request
lock — exactly the stall class static-shape bucketing exists to kill
(VERDICT r4 weak 3).

SINGLE-PROCESS ONLY on this image: an executable deserialized from the
cache in a multi-process (``jax.distributed``) run loses its gloo
collectives wiring and hangs silently at its first cross-process
collective (diagnosed via the faulthandler watchdog in
``tests/multihost_worker.py``; CLAUDE.md invariant). Every production CLI
that calls this is single-process (the daemon, retrieve, eval); the guard
below refuses anyway if a distributed client is live, so a future
multi-host CLI cannot re-introduce the hang by accident.
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "cmhse_tpu", "jax_cache")


def host_cpu_fingerprint() -> str:
    """Arch + cpuinfo-flags hash: XLA:CPU executables are host-ISA
    specific, and runs land on varying hosts — a cache entry compiled
    with AVX-512 must not be deserialized on a host without it."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        pass
    return hashlib.md5(
        (_platform.machine() + flags).encode()).hexdigest()[:12]


def _distributed_client_live() -> bool:
    """True when a jax.distributed client is initialized (the
    multi-process hang hazard above). Reads jax's private global state —
    there is no public probe that doesn't itself initialize a backend —
    behind a broad except so a jax-internal rename degrades to
    'assume single-process' (the overwhelmingly common case for the
    callers here)."""
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:
        return False


def add_cli_flag(parser, benefit: str) -> None:
    """Attach the shared ``--compile_cache DIR|off`` flag to a production
    CLI's parser; ``benefit`` states what the cache buys *that* CLI (the
    generic mechanics live here once)."""
    parser.add_argument(
        "--compile_cache", default=None, metavar="DIR|off",
        help="persistent XLA compilation cache directory (default: "
             "~/.cache/cmhse_tpu/jax_cache). " + benefit +
             " 'off' disables")


def enable_from_cli(compile_cache: str | None, prog: str) -> str | None:
    """Wire a CLI's ``--compile_cache`` value through
    :func:`enable_compile_cache`; returns the directory in use or None.

    With no explicit directory, a cache dir ALREADY configured
    in-process wins: pytest's conftest and bench.py point the process at
    their own fingerprinted cache *before* driving CLI mains in-process,
    and the default kicking in mid-suite would silently redirect every
    later compile. A dir merely inherited from the
    ``JAX_COMPILATION_CACHE_DIR`` env var is NOT authoritative the same
    way — it names the user's cache ROOT, so it is routed through
    :func:`enable_compile_cache` to pick up the CPU host-fingerprint
    subdir (sharing one flat dir across differing-ISA hosts is the
    segfault the fingerprint exists to prevent — review r5). An explicit
    DIR always takes effect."""
    if compile_cache == "off":
        return None
    if compile_cache is None:
        import jax

        current = getattr(jax.config, "jax_compilation_cache_dir", None)
        if current:
            if current != os.environ.get("JAX_COMPILATION_CACHE_DIR"):
                return current  # set programmatically in-process
            compile_cache = current  # env-var root: apply hardening below
    used = enable_compile_cache(compile_cache)
    if used:
        print(f"{prog}: persistent compile cache at {used}")
    return used


def enable_compile_cache(cache_dir: str | None = None,
                         min_compile_secs: float = 1.0) -> str | None:
    """Point jax at a persistent on-disk compilation cache; returns the
    directory used, or None when refused (multi-process run).

    CPU-platform runs get a host-fingerprinted subdir (see
    :func:`host_cpu_fingerprint`); TPU entries execute on the device, so
    they share the flat root."""
    import jax

    if _distributed_client_live():
        return None
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    platforms = getattr(jax.config, "jax_platforms", None) or ""
    if platforms.split(",")[0] == "cpu":
        cache_dir = os.path.join(cache_dir, f"cpu-{host_cpu_fingerprint()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
