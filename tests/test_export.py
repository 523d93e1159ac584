"""Checkpoint export (``cmhse-export``): the inverse migration direction.

A model born in THIS framework must be consumable by a torch-side user in
the reference's checkpoint shape (SURVEY.md C9 ``torch.save({'model': ...})``)
— pinned three ways: an exact interop round-trip (params -> state_dict ->
params), exported weights driving the live ``torch.nn`` replica to the same
embeddings, and the full CLI cycle export -> ``cmhse-import`` reproducing
the original parameters.
"""

import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")

from torch_replica import TorchCMHSE  # noqa: E402

from cmhse_tpu.cli.export_torch import main as export_main  # noqa: E402
from cmhse_tpu.cli.import_torch import main as import_main  # noqa: E402
from cmhse_tpu.config import ModelConfig  # noqa: E402
from cmhse_tpu.data.bucketing import BucketSpec, pad_batch  # noqa: E402
from cmhse_tpu.data.datasets import SyntheticHierarchicalDataset  # noqa: E402
from cmhse_tpu.interop import (infer_model_structure,  # noqa: E402
                               model_params_from_state_dict,
                               state_dict_from_model_params)
from cmhse_tpu.models import CMHSE  # noqa: E402
from cmhse_tpu.train.checkpoint import restore_for_eval  # noqa: E402

VOCAB, WORD_DIM, FEAT, HIDDEN, EMBED = 50, 12, 16, 20, 24

FLAG_SETS = {
    "flat": dict(hierarchical=False, attention_pool=False,
                 reconstruction=False),
    "full": dict(hierarchical=True, attention_pool=True,
                 reconstruction=True),
    "bidir": dict(hierarchical=True, attention_pool=False,
                  reconstruction=False, bidirectional=True),
}


def _native_params(flags, seed=0):
    """Params as a training run here would produce them: CMHSE.init."""
    mcfg = ModelConfig(embed_size=EMBED, word_dim=WORD_DIM, feat_dim=FEAT,
                       rnn_hidden=HIDDEN, **flags)
    model = CMHSE(cfg=mcfg, vocab_size=VOCAB)
    ds = SyntheticHierarchicalDataset(
        num_videos=2, feat_dim=FEAT, vocab_size=VOCAB,
        max_clips=3 if flags["hierarchical"] else 1, max_frames=4,
        max_words=4, seed=seed)
    spec = BucketSpec(batch_size=2,
                      max_clips=3 if flags["hierarchical"] else 1,
                      max_frames=4,
                      max_sentences=3 if flags["hierarchical"] else 1,
                      max_words=4, feat_dim=FEAT)
    batch = pad_batch([ds[0], ds[1]], spec)
    params = model.init(jax.random.PRNGKey(seed), batch)["params"]
    return model, jax.tree.map(np.asarray, dict(params))


@pytest.mark.parametrize("name", list(FLAG_SETS))
def test_state_dict_roundtrip_exact(name):
    """export -> import is the identity on the params pytree, and structure
    inference recovers the model hyperparameters from the exported keys."""
    flags = FLAG_SETS[name]
    _, params = _native_params(flags)
    sd = state_dict_from_model_params(params)

    info = infer_model_structure(sd)
    assert info["vocab_size"] == VOCAB
    assert info["rnn_hidden"] == HIDDEN
    assert info["embed_size"] == EMBED
    assert info["hierarchical"] == flags["hierarchical"]
    assert info["attention_pool"] == flags["attention_pool"]
    assert info["reconstruction"] == flags["reconstruction"]
    assert info["bidirectional"] == flags.get("bidirectional", False)

    back = model_params_from_state_dict(
        sd, hierarchical=flags["hierarchical"],
        reconstruction=flags["reconstruction"])
    flat_a = jax.tree.leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree.leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf, np.float32),
            np.asarray(flat_b[jax.tree_util.keystr(path)], np.float32),
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("name", list(FLAG_SETS))
def test_exported_weights_drive_torch_replica(name):
    """The real interop claim: weights born HERE, loaded into a live torch
    model via load_state_dict, produce the same embeddings."""
    flags = FLAG_SETS[name]
    model, params = _native_params(flags, seed=3)
    sd = state_dict_from_model_params(params)

    tm = TorchCMHSE(VOCAB, WORD_DIM, FEAT, HIDDEN, EMBED, **flags)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()})
    assert not missing and not unexpected

    rng = np.random.RandomState(1)
    b, c, f = 4, (3 if flags["hierarchical"] else 1), 5
    frames = rng.randn(b, c, f, FEAT).astype(np.float32)
    frame_len = rng.randint(1, f + 1, size=(b, c)).astype(np.int32)
    clip_len = np.full((b,), c, np.int32)
    video_emb, clip_emb = model.apply(
        {"params": params}, frames, frame_len, clip_len,
        method=model.encode_video)
    with torch.no_grad():
        tv, tclip = tm.encode_video(frames, frame_len, clip_len)
    np.testing.assert_allclose(np.asarray(video_emb), tv.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(clip_emb), tclip.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_export_cli_full_cycle(tmp_path):
    """import -> export(.pth.tar) -> tensors equal the source checkpoint;
    export(.npz) -> import reproduces the params (torch-free leg)."""
    torch.manual_seed(4)
    tm = TorchCMHSE(VOCAB, WORD_DIM, FEAT, HIDDEN, EMBED,
                    hierarchical=True, attention_pool=True,
                    reconstruction=True)
    src = str(tmp_path / "ref.pth.tar")
    torch.save({"model": tm.state_dict()}, src)
    run = str(tmp_path / "imported")
    assert import_main([src, run, "--platform", "cpu"]) == 0

    out_pth = str(tmp_path / "exported.pth.tar")
    assert export_main([run, out_pth, "--platform", "cpu"]) == 0
    re = torch.load(out_pth, map_location="cpu", weights_only=True)["model"]
    orig = tm.state_dict()
    assert set(re) == set(orig)
    for k in orig:
        np.testing.assert_allclose(re[k].numpy(), orig[k].numpy(),
                                   rtol=1e-6, atol=1e-7, err_msg=k)

    out_npz = str(tmp_path / "exported.npz")
    assert export_main([run, out_npz, "--platform", "cpu"]) == 0
    run2 = str(tmp_path / "reimported")
    assert import_main([out_npz, run2, "--platform", "cpu"]) == 0
    _, p1, _ = restore_for_eval(run)
    _, p2, _ = restore_for_eval(run2)
    import chex
    chex.assert_trees_all_close(p1, p2, rtol=1e-6)


def test_export_rejects_unknown_extension(tmp_path):
    from cmhse_tpu.cli.export_torch import export_checkpoint

    with pytest.raises((ValueError, FileNotFoundError)):
        export_checkpoint(str(tmp_path / "nope"), str(tmp_path / "x.bin"))
