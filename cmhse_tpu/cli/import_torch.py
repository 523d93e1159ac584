"""``cmhse-import`` — convert a reference PyTorch checkpoint into this
framework's checkpoint layout (SURVEY.md C9 serialization: the reference
saved ``torch.save({'model': state_dict, ...})`` each epoch).

The model hyperparameters are INFERRED from the state_dict's tensor shapes
and key presence (``cmhse_tpu.interop.infer_model_structure``), so the
minimal invocation is just ``cmhse-import ref.pth.tar runs/imported`` — the
output directory then works directly with ``cmhse-eval`` and
``cmhse-retrieve`` (``restore_for_eval`` reads its ``config.json`` +
``best/``).

Accepted inputs:
  * ``.pth`` / ``.pth.tar`` / ``.pt``: loaded with ``torch.load`` (torch is
    imported lazily and only here — the package itself stays torch-free);
    the state_dict is found under ``model`` / ``state_dict`` or at the root;
  * ``.npz``: flat dotted names -> arrays (a torch-free escape hatch:
    ``np.savez(out, **{k: v.numpy() for k, v in sd.items()})``).

For checkpoints whose module names differ from the documented replica
naming, pass ``--prefix_map '{"video_low": "vid_enc", ...}'``.
"""

from __future__ import annotations

import argparse
import json
import os


def load_flat_state_dict(path: str, allow_unsafe: bool = False) -> dict:
    """Load a flat name->numpy dict from .pth/.pt/.pth.tar or .npz.

    ``allow_unsafe`` is a per-call parameter (NOT process state — a single
    opted-in call must not weaken later library calls): full pickle
    deserialization runs only when the safe loader fails AND the caller
    opted in."""
    import numpy as np

    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch  # lazy: only the importer needs it

    # reference .pth.tar checkpoints are third-party artifacts: try the safe
    # tensors-only loader first; full unpickling (which executes arbitrary
    # pickle code) only behind the explicit opt-in (ADVICE.md round 2)
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as safe_err:
        if not allow_unsafe:
            raise ValueError(
                f"{path}: not loadable with torch's safe weights_only mode "
                f"({safe_err}). If you trust this checkpoint, re-run with "
                "--unsafe-load (full pickle deserialization executes "
                "arbitrary code embedded in the file)."
            ) from safe_err
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model", "state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict, got {type(obj)}")

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu()
            # bf16/f16 tensors have no direct numpy dtype path
            # (tensor.numpy() raises); upcast floats to f32 first
            if v.is_floating_point():
                v = v.float()
            return v.numpy()
        return np.asarray(v)

    return {k: to_np(v) for k, v in obj.items()}


def import_checkpoint(
    flat_sd: dict,
    out_dir: str,
    prefix_map: dict | None = None,
    dtype: str = "float32",
    readout: str = "last",
) -> tuple:
    """Convert + validate + persist; returns (model, params, cfg)."""
    import jax

    from cmhse_tpu.config import (DataConfig, ExperimentConfig, LossConfig,
                                  ModelConfig, TrainConfig)
    from cmhse_tpu.data.bucketing import BucketSpec, pad_batch
    from cmhse_tpu.data.datasets import SyntheticHierarchicalDataset
    from cmhse_tpu.interop import (infer_model_structure,
                                   model_params_from_state_dict)
    from cmhse_tpu.models import CMHSE

    info = infer_model_structure(flat_sd, prefix_map)
    vocab_size = info.pop("vocab_size")
    # readout ('last' vs 'mean') is parameterless — not inferable from
    # tensor shapes; the caller must know the reference's pooling
    mcfg = ModelConfig(dtype=dtype, readout=readout, **info)
    if mcfg.hierarchical:
        data_cfg = DataConfig(vocab_size=vocab_size, feat_dim=mcfg.feat_dim)
    else:
        # flat models consume the WHOLE video as one clip / paragraph as one
        # sentence: the default 64-frame/32-word caps would silently
        # truncate at eval — take the caps FROM the flat preset so a future
        # preset bump propagates here instead of leaving stale literals
        from cmhse_tpu.config import get_preset

        flat_caps = get_preset("flat_anet_subset").data
        data_cfg = DataConfig(vocab_size=vocab_size, feat_dim=mcfg.feat_dim,
                              max_clips=flat_caps.max_clips,
                              max_sentences=flat_caps.max_sentences,
                              max_frames=flat_caps.max_frames,
                              max_words=flat_caps.max_words)
    cfg = ExperimentConfig(
        name="imported",
        data=data_cfg,
        model=mcfg,
        loss=LossConfig(),
        train=TrainConfig(checkpoint_dir=out_dir),
    )

    params = model_params_from_state_dict(
        flat_sd, hierarchical=mcfg.hierarchical,
        reconstruction=mcfg.reconstruction, prefix_map=prefix_map,
    )

    # validate against a freshly-initialized template: identical tree
    # structure and leaf shapes, so a wrong prefix_map/flag combination
    # fails HERE with a readable diff, not at apply time
    model = CMHSE(cfg=mcfg, vocab_size=vocab_size)
    ds = SyntheticHierarchicalDataset(
        num_videos=2, feat_dim=mcfg.feat_dim, vocab_size=vocab_size,
        max_clips=cfg.data.max_clips, max_frames=4, max_words=4,
    )
    spec = BucketSpec(batch_size=2, max_clips=cfg.data.max_clips,
                      max_frames=4, max_sentences=cfg.data.max_sentences,
                      max_words=4, feat_dim=mcfg.feat_dim)
    sample = pad_batch([ds[0], ds[1]], spec)
    template = model.init(jax.random.PRNGKey(0), sample)["params"]
    t_shapes = jax.tree.map(lambda a: a.shape, dict(template))
    p_shapes = jax.tree.map(lambda a: a.shape, params)
    if t_shapes != p_shapes:
        raise ValueError(
            "imported params do not match the model structure:\n"
            f"  expected: {t_shapes}\n  imported: {p_shapes}"
        )

    from cmhse_tpu.train.checkpoint import eval_payload, write_best_dir

    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    write_best_dir(out_dir, eval_payload(params))
    return model, params, cfg


def main(argv=None) -> int:
    p = argparse.ArgumentParser("cmhse-import")
    p.add_argument("checkpoint", help=".pth/.pth.tar/.pt or .npz state_dict")
    p.add_argument("out_dir", help="output checkpoint directory "
                                   "(usable by cmhse-eval / cmhse-retrieve)")
    p.add_argument("--prefix_map", default=None,
                   help='JSON object remapping component -> torch module '
                        'prefix, e.g. \'{"video_low": "vid_enc"}\'')
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype recorded in the imported config")
    p.add_argument("--readout", default="last", choices=["last", "mean"],
                   help="low-level GRU readout of the source model — "
                        "parameterless, so it cannot be inferred from "
                        "tensor shapes")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--unsafe-load", action="store_true",
                   help="allow full pickle deserialization for checkpoints "
                        "torch's safe weights_only loader rejects (executes "
                        "code embedded in the file — trusted inputs only)")
    args = p.parse_args(argv)

    from cmhse_tpu.cli.train import _force_platform

    _force_platform(args.platform)

    prefix_map = json.loads(args.prefix_map) if args.prefix_map else None
    flat = load_flat_state_dict(args.checkpoint,
                                allow_unsafe=args.unsafe_load)
    model, params, cfg = import_checkpoint(
        flat, args.out_dir, prefix_map=prefix_map, dtype=args.dtype,
        readout=args.readout,
    )
    n = sum(int(a.size) for a in __import__("jax").tree.leaves(params))
    print(f"imported {len(flat)} tensors ({n:,} parameters) -> "
          f"{args.out_dir} (model: {cfg.model})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
