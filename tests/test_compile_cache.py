"""Persistent compile cache for production CLIs (VERDICT r4 weak 3): a
restarted process re-uses on-disk executables instead of recompiling —
asserted by counting cache entries across two fresh processes — and the
multi-process refusal guard holds (the CLAUDE.md jax.distributed hazard).
"""

import json
import os
import subprocess
import sys

SCRIPT = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from cmhse_tpu.utils.compile_cache import enable_compile_cache
used = enable_compile_cache(sys.argv[1], min_compile_secs=0.0)
assert used, "single-process enable must not refuse"
import jax.numpy as jnp

@jax.jit
def distinctive(x):
    # shape/op mix unlikely to collide with any other suite program
    return jnp.tanh(x @ x.T)[::3, 1::2].sum() + 41.25

out = float(distinctive(jnp.arange(91.0).reshape(7, 13)))
files = [f for f in os.listdir(used) if not f.startswith(".")]
print(json.dumps({"out": out, "n_entries": len(files), "dir": used}))
"""


def _run(cache_dir: str) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", SCRIPT, cache_dir],
                       capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cache_survives_process_restart(tmp_path):
    cache_dir = str(tmp_path / "cache")
    first = _run(cache_dir)
    assert first["n_entries"] > 0, "first run must persist executables"
    second = _run(cache_dir)
    assert second["out"] == first["out"]
    # a cache HIT writes nothing new: entry count is unchanged across the
    # "restart" — the daemon's re-warm-from-disk story in miniature
    assert second["n_entries"] == first["n_entries"]


def test_refuses_when_distributed_client_live(tmp_path, monkeypatch):
    from jax._src import distributed

    from cmhse_tpu.utils import compile_cache

    monkeypatch.setattr(distributed.global_state, "client", object(),
                        raising=False)
    assert compile_cache.enable_compile_cache(str(tmp_path / "c")) is None
    assert not (tmp_path / "c").exists()


def test_cpu_platform_gets_fingerprinted_subdir(tmp_path):
    out = _run(str(tmp_path / "fp"))
    from cmhse_tpu.utils.compile_cache import host_cpu_fingerprint

    assert os.path.basename(out["dir"]) == f"cpu-{host_cpu_fingerprint()}"


def test_enable_from_cli_off_and_already_configured(tmp_path):
    """The CLI wiring: 'off' disables; the DEFAULT (no explicit dir) must
    respect a process-level cache that is already configured — conftest
    points this very suite at its own fingerprinted dir before dress
    rehearsals drive CLI mains in-process, and the CLI default kicking in
    would silently redirect every later compile in the process."""
    import jax

    from cmhse_tpu.utils.compile_cache import enable_from_cli

    before = jax.config.jax_compilation_cache_dir
    assert before, "suite conftest is expected to configure a cache"
    assert enable_from_cli("off", "t") is None
    assert jax.config.jax_compilation_cache_dir == before
    assert enable_from_cli(None, "t") == before
    assert jax.config.jax_compilation_cache_dir == before


def test_enable_from_cli_explicit_dir_overrides(tmp_path):
    """An explicit --compile_cache DIR always takes effect (restored after
    the assertion — process-global config)."""
    import jax

    from cmhse_tpu.utils.compile_cache import (enable_from_cli,
                                               host_cpu_fingerprint)

    before = jax.config.jax_compilation_cache_dir
    try:
        used = enable_from_cli(str(tmp_path / "explicit"), "t")
        # cpu-platform suite: the fingerprinted subdir policy applies
        assert used == os.path.join(str(tmp_path / "explicit"),
                                    f"cpu-{host_cpu_fingerprint()}")
        assert jax.config.jax_compilation_cache_dir == used
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_production_clis_expose_compile_cache_flag(capsys):
    """Every production CLI (train/eval/retrieve/serve) carries the shared
    --compile_cache flag; --help exits before any heavy work."""
    import pytest

    from cmhse_tpu.cli import evaluate, retrieve, serve_daemon, train

    for mod in (train, evaluate, retrieve, serve_daemon):
        with pytest.raises(SystemExit) as e:
            mod.main(["--help"])
        assert e.value.code == 0
        assert "--compile_cache" in capsys.readouterr().out, mod.__name__


def test_enable_from_cli_env_var_dir_gets_fingerprint_subdir(monkeypatch):
    """A cache dir merely inherited from JAX_COMPILATION_CACHE_DIR names
    the user's cache ROOT — the CLI wiring must still route it through
    enable_compile_cache so the CPU host-fingerprint subdir applies
    (one flat dir shared across differing-ISA hosts deserializes
    wrong-ISA XLA:CPU executables — review r5); only a dir set
    PROGRAMMATICALLY in-process (conftest/bench) is respected as-is."""
    import tempfile

    import jax

    from cmhse_tpu.utils.compile_cache import (enable_from_cli,
                                               host_cpu_fingerprint)

    before = jax.config.jax_compilation_cache_dir
    with tempfile.TemporaryDirectory() as root:
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", root)
        try:
            jax.config.update("jax_compilation_cache_dir", root)
            used = enable_from_cli(None, "t")
            assert used == os.path.join(root,
                                        f"cpu-{host_cpu_fingerprint()}")
            assert jax.config.jax_compilation_cache_dir == used
        finally:
            jax.config.update("jax_compilation_cache_dir", before)
