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

# persistent compile cache: repeated suite runs skip recompiles
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + repr(jax.devices())
)
assert jax.device_count() == 8, jax.devices()
