"""End-to-end checkpoint migration: a reference-style ``torch.save`` file ->
``cmhse-import`` -> ``restore_for_eval`` -> embeddings match the live torch
model (SURVEY.md C9 serialization; the reference's ``.pth.tar`` checkpoints
are a user's main asset when switching frameworks)."""

import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")

from torch_replica import TorchCMHSE  # noqa: E402

from cmhse_tpu.cli.import_torch import (load_flat_state_dict,  # noqa: E402
                                        main as import_main)
from cmhse_tpu.interop import (infer_model_structure,  # noqa: E402
                               model_params_from_state_dict)
from cmhse_tpu.train.checkpoint import restore_for_eval  # noqa: E402

VOCAB, WORD_DIM, FEAT, HIDDEN, EMBED = 50, 12, 16, 20, 24


def _reference_style_checkpoint(tmp_path, **flags):
    torch.manual_seed(0)
    tm = TorchCMHSE(VOCAB, WORD_DIM, FEAT, HIDDEN, EMBED, **flags)
    path = str(tmp_path / "model_best.pth.tar")
    # the reference wrapped the state_dict in a metadata dict (SURVEY.md C9)
    torch.save({"model": tm.state_dict(), "epoch": 3, "best_rsum": 123.4},
               path)
    return tm, path


def test_infer_model_structure():
    tm, path = _reference_style_checkpoint(
        pytest.importorskip("pathlib").Path("/tmp"),
        hierarchical=True, attention_pool=True, reconstruction=True,
    )
    flat = load_flat_state_dict(path)
    info = infer_model_structure(flat)
    assert info == {
        "vocab_size": VOCAB, "word_dim": WORD_DIM, "feat_dim": FEAT,
        "rnn_hidden": HIDDEN, "embed_size": EMBED, "hierarchical": True,
        "attention_pool": True, "reconstruction": True,
        "bidirectional": False,
    }


def test_strict_rejects_unconsumed_tensors():
    tm, path = _reference_style_checkpoint(
        pytest.importorskip("pathlib").Path("/tmp"), hierarchical=True,
    )
    flat = load_flat_state_dict(path)
    flat["mystery.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        model_params_from_state_dict(flat, hierarchical=True)


@pytest.mark.parametrize("flags", [
    dict(hierarchical=True, attention_pool=False, reconstruction=False),
    dict(hierarchical=True, attention_pool=True, reconstruction=True),
    # the *_reverse layout branch through the FULL import CLI (VERDICT r2
    # missing 6): shape inference must detect bidirectional and the
    # transplanted reverse weights must reproduce torch's embeddings
    dict(hierarchical=True, attention_pool=False, reconstruction=False,
         bidirectional=True),
])
def test_import_cli_roundtrip_matches_torch(tmp_path, flags):
    tm, path = _reference_style_checkpoint(tmp_path, **flags)
    out_dir = str(tmp_path / "imported")
    assert import_main([path, out_dir, "--platform", "cpu"]) == 0

    model, params, cfg = restore_for_eval(out_dir)
    assert cfg.model.hierarchical == flags["hierarchical"]
    assert cfg.model.attention_pool == flags["attention_pool"]
    assert cfg.data.vocab_size == VOCAB

    rng = np.random.RandomState(1)
    b, c, f = 4, 3, 5
    frames = rng.randn(b, c, f, FEAT).astype(np.float32)
    frame_len = rng.randint(1, f + 1, size=(b, c)).astype(np.int32)
    clip_len = np.full((b,), c, np.int32)

    video_emb, clip_emb = model.apply(
        {"params": params}, frames, frame_len, clip_len,
        method=model.encode_video,
    )
    with torch.no_grad():
        tv, tclip = tm.encode_video(frames, frame_len, clip_len)
    np.testing.assert_allclose(np.asarray(video_emb), tv.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(clip_emb), tclip.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_import_npz_torch_free_path(tmp_path):
    """The .npz escape hatch: same tensors, no torch involved in loading."""
    torch.manual_seed(2)
    tm = TorchCMHSE(VOCAB, WORD_DIM, FEAT, HIDDEN, EMBED, hierarchical=True)
    flat = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    path = str(tmp_path / "sd.npz")
    np.savez(path, **flat)
    out_dir = str(tmp_path / "imported_npz")
    assert import_main([path, out_dir, "--platform", "cpu"]) == 0
    model, params, cfg = restore_for_eval(out_dir)
    emb = np.asarray(params["word_embedding"]["embedding"])
    np.testing.assert_allclose(emb, flat["embedding.weight"], rtol=1e-6)


def test_infer_bidirectional_without_proj_embed_size():
    """No joint projection + bidirectional GRU => the encoder emits 2H, so
    embed_size must infer as 2*rnn_hidden (H alone would build a template
    WITH a proj and reject the valid checkpoint)."""
    import numpy as np

    from cmhse_tpu.interop import infer_model_structure

    H, D = 8, 6
    sd = {
        "embedding.weight": np.zeros((50, 5), np.float32),
        "video_low.gru.weight_ih_l0": np.zeros((3 * H, D), np.float32),
        "video_low.gru.weight_ih_l0_reverse": np.zeros((3 * H, D),
                                                       np.float32),
    }
    info = infer_model_structure(sd)
    assert info["bidirectional"] is True
    assert info["embed_size"] == 2 * H


def test_missing_tensor_gives_readable_error():
    """A checkpoint with slightly different naming must fail with guidance
    (module's actual keys + a --prefix_map pointer), not a bare KeyError."""
    import numpy as np
    import pytest as _pytest

    from cmhse_tpu.interop import model_params_from_state_dict

    sd = {
        "embedding.weight": np.zeros((50, 5), np.float32),
        "video_low.rnn.weight_ih_l0": np.zeros((24, 6), np.float32),  # 'rnn'
    }
    with _pytest.raises(ValueError, match="prefix_map"):
        model_params_from_state_dict(sd, hierarchical=False)
