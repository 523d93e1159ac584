"""CLI flag surface (SURVEY.md C13): reference flag names must map onto the
config dataclasses correctly."""

import pytest

from cmhse_tpu.cli.train import apply_overrides, build_parser
from cmhse_tpu.config import get_preset


def _cfg(argv):
    args = build_parser().parse_args(argv)
    return apply_overrides(get_preset(args.preset), args)


def test_defaults_pass_through():
    cfg = _cfg(["--preset", "hier_anet"])
    assert cfg.model.hierarchical is True
    assert cfg.loss.margin == 0.2
    assert cfg.loss.max_violation is True


def test_reference_flags_map():
    cfg = _cfg([
        "--preset", "hier_anet",
        "--margin", "0.3",
        "--embed_size", "512",
        "--word_dim", "200",
        "--num_epochs", "7",
        "--batch_size", "16",
        "--lr", "2e-4",
        "--lr_update", "10",
        "--grad_clip", "1.5",
        "--logger_name", "/tmp/xyz",
        "--data_path", "/data/anet",
        "--data_name", "anet_precomp",
        "--feat_dim", "2048",
        "--word2vec_path", "/data/vec.npz",
    ])
    assert cfg.data.word2vec_path == "/data/vec.npz"
    assert cfg.loss.margin == 0.3
    assert cfg.model.embed_size == 512
    assert cfg.model.word_dim == 200
    assert cfg.train.num_epochs == 7
    assert cfg.data.batch_size == 16
    assert cfg.train.lr == 2e-4
    assert cfg.train.lr_update == 10
    assert cfg.train.grad_clip == 1.5
    assert cfg.train.checkpoint_dir == "/tmp/xyz"
    assert cfg.data.data_path == "/data/anet"
    assert cfg.data.dataset == "anet_precomp"
    assert cfg.data.feat_dim == 2048 and cfg.model.feat_dim == 2048


def test_flat_and_loss_structure_flags():
    cfg = _cfg(["--preset", "hier_anet", "--flat", "--no_max_violation",
                "--low_weight", "0.0", "--recon_weight", "0.001"])
    assert cfg.model.hierarchical is False
    assert cfg.loss.max_violation is False
    assert cfg.loss.low_weight == 0.0
    assert cfg.loss.recon_weight == 0.001


def test_pallas_gru_flag_tristate():
    cfg_on = _cfg(["--pallas_gru"])
    assert cfg_on.model.pallas_gru is True
    cfg_off = _cfg(["--no_pallas_gru"])
    assert cfg_off.model.pallas_gru is False
    # default: auto-detected from the platform (cpu in tests -> False)
    cfg_auto = _cfg([])
    assert cfg_auto.model.pallas_gru is False


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        _cfg(["--preset", "nope"])


def test_config_json_roundtrip_through_overrides():
    from cmhse_tpu.config import ExperimentConfig

    cfg = _cfg(["--preset", "cmhse_full", "--margin", "0.25"])
    cfg2 = ExperimentConfig.from_json(cfg.to_json())
    assert cfg2.loss.margin == 0.25
    assert cfg2.model.attention_pool is True
    assert cfg2.model.reconstruction is True

def test_feature_dtype_follows_model_dtype():
    # explicit flag wins
    cfg = _cfg(["--preset", "hier_anet", "--feature_dtype", "bfloat16"])
    assert cfg.data.feature_dtype == "bfloat16"
    # bf16 model auto-selects bf16 ingestion (bit-identical, half the DMA)
    cfg = _cfg(["--preset", "hier_anet", "--dtype", "bfloat16"])
    assert cfg.data.feature_dtype == "bfloat16"
    # f32 model keeps f32 features
    cfg = _cfg(["--preset", "hier_anet", "--dtype", "float32"])
    assert cfg.data.feature_dtype == "float32"
    # explicit f32 ingestion survives a bf16 model (parity runs)
    cfg = _cfg(["--preset", "hier_anet", "--dtype", "bfloat16",
                "--feature_dtype", "float32"])
    assert cfg.data.feature_dtype == "float32"


def test_vocab_cli_data_name_subdirectory(tmp_path):
    """--data_name selects the reference's <data_path>/<data_name>/ layout
    (review r5: the flag used to be accepted and silently ignored); a
    wrong name fails with the layout spelled out instead of a raw
    FileNotFoundError."""
    import json

    from cmhse_tpu.cli.build_vocab import main as vocab_main

    sub = tmp_path / "anet_precomp"
    sub.mkdir()
    (sub / "train_captions.json").write_text(json.dumps(
        {"v_a": {"timestamps": [[0, 1]], "sentences": ["a man runs"],
                 "duration": 1.0}}))
    rc = vocab_main(["--data_path", str(tmp_path),
                     "--data_name", "anet_precomp", "--threshold", "1"])
    assert rc == 0
    assert (sub / "vocab.json").exists()  # lands NEXT TO the captions

    with pytest.raises(SystemExit, match="SUBDIRECTORY"):
        vocab_main(["--data_path", str(tmp_path),
                    "--data_name", "nope", "--threshold", "1"])


def test_flat_override_clears_reconstruction():
    """--flat on a reconstruction preset must drop the recon term along
    with the hierarchy caps it already drops — not trip ModelConfig's
    reconstruction+flat rejection (review r5: the flat-ablation flag
    combination `--preset cmhse_full --flat` raised at config build)."""
    cfg = _cfg(["--preset", "cmhse_full", "--flat"])
    assert cfg.model.hierarchical is False
    assert cfg.model.reconstruction is False


def test_flat_with_explicit_reconstruction_still_rejected():
    """An EXPLICIT --reconstruction alongside --flat is a real config
    error and must keep failing loud."""
    with pytest.raises(ValueError, match="hierarchical"):
        _cfg(["--preset", "cmhse_full", "--flat", "--reconstruction"])


def test_legacy_flat_reconstruction_config_json_loads():
    """config.json written in the era when reconstruction+flat was
    silently IGNORED must stay loadable: the flat model never had the
    recon term, so dropping the flag on load reproduces the trained
    behavior instead of making the checkpoint unrestorable (review r5)."""
    import json as _json

    from cmhse_tpu.config import ExperimentConfig

    raw = _json.loads(get_preset("cmhse_full").to_json())
    raw["model"]["hierarchical"] = False
    raw["model"]["reconstruction"] = True
    loaded = ExperimentConfig.from_json(_json.dumps(raw))
    assert loaded.model.reconstruction is False
    assert loaded.model.hierarchical is False
