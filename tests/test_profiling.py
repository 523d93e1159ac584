"""xplane profile parsing utility (cmhse_tpu/utils/profiling.py) — the
bench's device-time MFU leg depends on it; pin the parse path and the
off-TPU failure mode on a real CPU trace."""

import tempfile

import jax
import jax.numpy as jnp
import pytest

from cmhse_tpu.utils.profiling import (_load_xspace, device_busy_seconds,
                                       op_durations_ms)


@pytest.fixture(scope="module")
def cpu_trace():
    td = tempfile.mkdtemp(prefix="cmhse_prof_test_")
    f = jax.jit(lambda x: jnp.sum(x * x))
    float(f(jnp.ones(512)))  # compile outside the trace
    with jax.profiler.trace(td):
        for i in range(2):
            float(f(jnp.ones(512) * (i + 1)))
    return td


def test_load_xspace_parses_real_trace(cpu_trace):
    space = _load_xspace(cpu_trace)
    names = [p.name for p in space.planes]
    assert any("/host:CPU" in n for n in names)


def test_device_busy_raises_off_tpu(cpu_trace):
    """A CPU trace has no /device:TPU plane; the MFU leg must fail loudly
    (bench catches it and reports mfu_device: null) rather than report 0."""
    with pytest.raises(RuntimeError, match="no /device:TPU"):
        device_busy_seconds(cpu_trace)


def test_missing_trace_dir_raises():
    with pytest.raises(FileNotFoundError, match="xplane"):
        device_busy_seconds(tempfile.mkdtemp(prefix="cmhse_empty_"))


def test_op_durations_empty_for_cpu_trace(cpu_trace):
    # no TPU planes => no XLA Ops entries; must return [] not crash
    assert op_durations_ms(cpu_trace) == []
