"""``cmhse-export`` — convert a framework checkpoint directory back into a
reference-style PyTorch checkpoint (the inverse of ``cmhse-import``).

The reference serialized ``torch.save({'model': state_dict, ...})`` files
(SURVEY.md C9); this writes the same shape so a model trained (or imported
and fine-tuned) here can be handed back to a torch-side consumer — the
migration path works in BOTH directions. Output format by extension:

  * ``.pth`` / ``.pth.tar`` / ``.pt``: ``torch.save({'model': state_dict})``
    with f32 tensors (torch imported lazily, only here);
  * ``.npz``: flat dotted names -> float32 arrays, torch-free (the same
    escape-hatch format ``cmhse-import`` accepts, so
    export -> import round-trips without torch installed).

Tensor layouts exactly invert the import mapping (fused GRU ``[D,3H]`` ->
``[3H,D]``, Dense kernel ``[in,out]`` -> Linear ``[out,in]``); parity of the
exported weights inside a live ``torch.nn`` replica is pinned by
tests/test_export.py.
"""

from __future__ import annotations

import argparse
import json
import os


def export_checkpoint(
    checkpoint_dir: str,
    out_path: str,
    prefix_map: dict | None = None,
) -> dict:
    """Load ``checkpoint_dir``'s best params, return + write the flat
    torch-layout state_dict to ``out_path`` (format by extension)."""
    import jax
    import numpy as np

    from cmhse_tpu.interop import state_dict_from_model_params
    from cmhse_tpu.train.checkpoint import restore_for_eval

    out_path = os.path.abspath(out_path)
    if not out_path.endswith((".npz", ".pth", ".pt", ".pth.tar")):
        # fail on the typo BEFORE the (expensive) checkpoint restore; a
        # bare .tar would be torch.save bytes masquerading as a tar archive
        raise ValueError(
            f"unsupported output extension on {out_path!r} "
            "(use .pth/.pth.tar/.pt or .npz)")
    if not out_path.endswith(".npz"):
        # same fail-early rule for the torch dependency: a torch-free host
        # should find out before the restore, not after
        import torch  # noqa: F401

    _, params, _ = restore_for_eval(checkpoint_dir)
    sd = state_dict_from_model_params(
        jax.tree.map(np.asarray, dict(params)), prefix_map)

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    if out_path.endswith(".npz"):
        np.savez(out_path, **sd)
    else:
        import torch  # lazy: only the torch output format needs it

        torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
                   out_path)
    return sd


def main(argv=None) -> int:
    p = argparse.ArgumentParser("cmhse-export")
    p.add_argument("checkpoint_dir",
                   help="framework run directory (config.json + best/)")
    p.add_argument("out", help="output path: .pth/.pth.tar/.pt or .npz")
    p.add_argument("--prefix_map", default=None,
                   help='JSON object remapping component -> torch module '
                        'prefix, e.g. \'{"video_low": "vid_enc"}\' '
                        '(same convention as cmhse-import)')
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args(argv)

    from cmhse_tpu.cli.train import _force_platform

    _force_platform(args.platform)

    prefix_map = json.loads(args.prefix_map) if args.prefix_map else None
    sd = export_checkpoint(args.checkpoint_dir, args.out, prefix_map)
    n = sum(int(v.size) for v in sd.values())
    print(f"exported {len(sd)} tensors ({n:,} parameters) -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
