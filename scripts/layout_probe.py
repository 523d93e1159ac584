"""Input-layout probe for the encode-side `copy.37` (PERFORMANCE.md
"Remaining headroom"): XLA lays out the frames parameter {0,2,3,1} but the
first GRU GEMM wants {3,1,0,2}, inserting a ~0.2 ms relayout copy per
B=128 batch. jax 0.9 exposes input layout constraints
(`jax.experimental.layout.Format`) that were "not expressible via jnp"
when that note was written — this probe measures whether pinning the
frames input layout to the GEMM's preference removes the copy, by
device-busy time (xplane parse, the honest method; see PERFORMANCE.md
"Measurement pitfalls").

Run on the real chip, idle host: `python scripts/layout_probe.py`.
Prints one JSON line; record the outcome (win or null) in PERFORMANCE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench


def _device_ms(fn, args, n_steps=3):
    """Mean device-busy ms per call of ``fn(*args, seed)`` over a profiled
    window (compile outside; distinct seeds defeat relay memoization)."""
    from cmhse_tpu.utils.profiling import device_busy_seconds

    float(fn(*args, jnp.float32(0.5)))  # compile + warm
    trace_dir = tempfile.mkdtemp(prefix="cmhse_layout_")
    with jax.profiler.trace(trace_dir):
        for i in range(n_steps):
            float(fn(*args, jnp.float32(1.0 + i)))
    return device_busy_seconds(trace_dir) / n_steps * 1e3


def main() -> None:
    bench._enable_compile_cache()
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    model, params, batch = bench._build_model_and_batch()
    frames = batch.frames
    rest = batch.replace(frames=None)

    def encode(fr, seed):
        b = rest.replace(frames=fr + (seed * 1e-3).astype(fr.dtype))
        out = model.apply({"params": params}, b)
        return (jnp.sum(out.video_emb.astype(jnp.float32))
                + jnp.sum(out.para_emb.astype(jnp.float32)))

    out = {"frames_shape": list(frames.shape), "dtype": str(frames.dtype)}
    base = jax.jit(encode)
    out["device_ms_default"] = round(_device_ms(base, (frames,)), 3)
    print(f"default layout: {out['device_ms_default']} ms/batch",
          flush=True)

    dev = jax.devices()[0]
    sd = SingleDeviceSharding(dev)
    for m2m in [(3, 1, 0, 2), (2, 1, 0, 3)]:
        name = "".join(map(str, m2m))
        try:
            fmt = Format(Layout(major_to_minor=m2m), sd)
            fr_l = jax.device_put(frames, fmt)
            jitted = jax.jit(encode, in_shardings=(fmt, None))
            ms = _device_ms(jitted, (fr_l,))
            out[f"device_ms_m2m_{name}"] = round(ms, 3)
            rel = ms / out["device_ms_default"]
            print(f"major_to_minor {m2m}: {ms:.3f} ms/batch "
                  f"({rel:.3f}x default)", flush=True)
        except Exception as e:
            out[f"device_ms_m2m_{name}"] = None
            print(f"major_to_minor {m2m}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
