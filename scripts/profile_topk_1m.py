"""Op-level anatomy of the exact 1M-gallery streaming top-k.

PERFORMANCE.md's headroom ledger attributes the exact path's residual
(~38.7k QPS vs the ~44k "GEMM bound") to "the per-chunk group-max + two
``lax.top_k`` launches" — an attribution inferred from design-point A/Bs,
not from an op profile at this scale. Before any epilogue surgery
(fusing group-max into the GEMM would break the einsum the relay already
schedules at roofline, and a recompute-based two-pass design risks the
bit-exactness contract), get the actual per-op breakdown: run
``streaming_sim_topk`` on a prepared 1M x 1024 gallery under
``jax.profiler.trace`` and print the top ops by device time.

Run on the real chip, idle host: ``python scripts/profile_topk_1m.py``.
Record conclusions in PERFORMANCE.md ("Remaining headroom").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--q", type=int, default=1024)
    p.add_argument("--d", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from cmhse_tpu.ops.similarity import l2norm
    from cmhse_tpu.ops.topk import prepare_topk_gallery, streaming_sim_topk
    from cmhse_tpu.utils.profiling import device_busy_seconds, op_durations_ms

    print("platform:", jax.devices()[0].platform, flush=True)
    key = jax.random.PRNGKey(0)
    kg, kq = jax.random.split(key)
    # generate on device: a 4 GB host->device transfer through the relay
    # would dominate setup. bf16-stored prepared chunks halve steady memory.
    gallery = l2norm(jax.random.normal(kg, (args.n, args.d), jnp.float32))
    pg = prepare_topk_gallery(gallery, quantize=False)
    del gallery  # free the f32 source; the prepared bf16 chunks remain
    queries = l2norm(jax.random.normal(kq, (args.reps + 1, args.q, args.d),
                                       jnp.float32))
    jax.block_until_ready((pg, queries))

    # warm: compile + first-touch outside the trace
    s, i = streaming_sim_topk(queries[0], pg, k=args.k)
    jax.block_until_ready((s, i))

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            acc = jnp.float32(0)
            for r in range(args.reps):  # fresh args: the relay memoizes
                s, i = streaming_sim_topk(queries[1 + r], pg, k=args.k)
                acc = acc + s.sum() + i.sum()
            float(acc)  # forces completion of everything traced
        busy = device_busy_seconds(td)
        ops = op_durations_ms(td, top=args.top)

    per_call_ms = busy / args.reps * 1e3
    print(f"\ndevice busy: {busy * 1e3:.2f} ms over {args.reps} calls "
          f"-> {per_call_ms:.2f} ms/call, "
          f"{args.q * args.reps / busy:,.0f} QPS (device-time)", flush=True)
    print(f"\ntop {args.top} ops by device time (total over "
          f"{args.reps} calls):")
    for name, ms in ops:
        print(f"  {ms:9.3f} ms  {ms / (busy * 1e3) * 100:5.1f}%  {name}")
    print(json.dumps({
        "n": args.n, "q": args.q, "d": args.d, "k": args.k,
        "per_call_ms": round(per_call_ms, 3),
        "qps_device_time": round(args.q * args.reps / busy, 1),
        "top_ops_ms": {name: round(ms / args.reps, 3)
                       for name, ms in ops[:10]},
    }))


if __name__ == "__main__":
    main()
