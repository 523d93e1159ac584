"""Op-level xplane profile parsing (SURVEY.md section 5 tracing row).

The tensorboard-plugin-profile converters are broken on this image, so the
``jax.profiler.trace`` output is parsed directly from the ``xplane.pb``
protobuf (the recipe PERFORMANCE.md documents and round 2's step anatomy
used). This module makes that recipe a first-class utility: ``bench.py``
uses it to ground the headline MFU in measured DEVICE time rather than the
host-side slope (VERDICT r2 weak 1 / next-step 3).
"""

from __future__ import annotations

import glob
import os


def _load_xspace(trace_dir: str):
    # the pure-python protobuf impl is required on this image; set before
    # the first protobuf import or the flag has no effect
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")
    ))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


def device_busy_seconds(trace_dir: str, line_name: str = "XLA Ops") -> float:
    """Total TPU compute time in a trace: sum of event durations on the
    device planes' ``XLA Ops`` line (ops are serialized on the compute core,
    so the sum IS the busy time; host gaps/dispatch latency are excluded —
    exactly the denominator an MFU claim should use)."""
    space = _load_xspace(trace_dir)
    total_ps = 0
    seen_device = False
    for plane in space.planes:
        if "/device:TPU" not in plane.name:
            continue
        seen_device = True
        for line in plane.lines:
            if line.name != line_name:
                continue
            for ev in line.events:
                total_ps += ev.duration_ps
    if not seen_device:
        raise RuntimeError(
            f"trace at {trace_dir} has no /device:TPU plane (ran on "
            "CPU, or profiling failed)"
        )
    return total_ps * 1e-12


def op_durations_ms(trace_dir: str, top: int = 20) -> list[tuple[str, float]]:
    """Per-op total durations (ms), descending — the step-anatomy view."""
    space = _load_xspace(trace_dir)
    by_name: dict[str, int] = {}
    for plane in space.planes:
        if "/device:TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                by_name[name] = by_name.get(name, 0) + ev.duration_ps
    ranked = sorted(by_name.items(), key=lambda kv: -kv[1])[:top]
    return [(k, v * 1e-9) for k, v in ranked]
