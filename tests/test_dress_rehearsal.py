"""CLI dress rehearsal over a reference-layout data directory (VERDICT r2
next-step 1: the last untested reference-shaped workflow).

Drives the REAL console entry points in the order a reference user would
(SURVEY.md sections 3.1/3.2/3.4 call stacks — no reference line citations
possible; the mount is empty), over a generated dataset dir in the exact
reference on-disk layout (challenge-nested h5 + captions json + vocab +
word2vec .bin):

    cmhse-vocab -> cmhse-train -> cmhse-eval (plain + sharded/gallery)
    -> cmhse-import (torch replica .pth.tar) -> cmhse-eval (imported)
    -> cmhse-retrieve

The test would run unchanged on a real downloaded ActivityNet directory —
only the fixture-generation step would be replaced by the download.
"""

import json
import os

import numpy as np
import pytest

from reference_layout import (write_reference_dataset, write_word2vec_bin,
                              make_sentence)

from cmhse_tpu.data.vocab import Vocabulary

# tiny-but-real model dims: hidden == embed so no joint projection (matches
# what shape inference expects for the replica checkpoint import leg)
FEAT, WORD_DIM, HIDDEN, EMBED = 8, 5, 16, 16


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("refdata")
    write_reference_dataset(str(root), n_train=12, n_val=8, feat_dim=FEAT)
    return str(root)


def _jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_find_vocab_resolution(tmp_path):
    """Reference users arrive with PICKLE vocabs; eval/serving entry points
    resolve vocab.json, then vocab.pkl, then *vocab*.pkl, and an explicit
    path always wins."""
    from cmhse_tpu.data.vocab import build_vocab, find_vocab

    vocab = build_vocab(["a man runs"] * 2, threshold=1)
    with pytest.raises(FileNotFoundError, match="cmhse-vocab"):
        find_vocab(str(tmp_path))
    vocab.save(str(tmp_path / "anet_precomp_vocab.pkl"))
    assert find_vocab(str(tmp_path)).endswith("anet_precomp_vocab.pkl")
    vocab.save(str(tmp_path / "vocab.pkl"))
    assert find_vocab(str(tmp_path)).endswith("/vocab.pkl")
    vocab.save(str(tmp_path / "vocab.json"))
    assert find_vocab(str(tmp_path)).endswith("/vocab.json")
    assert find_vocab(str(tmp_path), "explicit.pkl") == "explicit.pkl"
    loaded = Vocabulary.load(find_vocab(str(tmp_path)))
    assert loaded.word2idx == vocab.word2idx


def test_cli_dress_rehearsal(data_dir, tmp_path, capsys, monkeypatch):
    # ---- 1. cmhse-vocab (reference: python vocab.py; SURVEY 3.4) --------
    from cmhse_tpu.cli.build_vocab import main as vocab_main

    assert vocab_main(["--data_path", data_dir, "--threshold", "1"]) == 0
    vocab = Vocabulary.load(os.path.join(data_dir, "vocab.json"))
    assert len(vocab) > 10  # specials + the word pool
    assert vocab("man") != vocab(Vocabulary.UNK)
    # reference-era pickle serialization must also work as an output format
    pkl = os.path.join(data_dir, "vocab.pkl")
    assert vocab_main(["--data_path", data_dir, "--threshold", "1",
                       "--out", pkl]) == 0
    assert Vocabulary.load(pkl).word2idx == vocab.word2idx

    # ---- 2. word2vec .bin covering some vocabulary words ----------------
    w2v = os.path.join(data_dir, "vectors.bin")
    write_word2vec_bin(w2v, ["man", "runs", "park", "dog", "woman"],
                       dim=WORD_DIM)

    # ---- 3. cmhse-train (reference: python train.py; SURVEY 3.1) --------
    from cmhse_tpu.cli.train import main as train_main

    ckpt = str(tmp_path / "run")
    rc = train_main([
        "--preset", "hier_anet", "--platform", "cpu",
        "--data_path", data_dir,
        "--word2vec_path", w2v,
        "--vocab_size", str(len(vocab)),
        "--feat_dim", str(FEAT), "--word_dim", str(WORD_DIM),
        "--rnn_hidden", str(HIDDEN), "--embed_size", str(EMBED),
        "--max_clips", "3", "--max_frames", "6",
        "--max_sentences", "3", "--max_words", "12",
        "--batch_size", "8", "--num_epochs", "2", "--log_step", "1",
        "--logger_name", ckpt,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "word2vec init: 5/" in out  # all 5 vector words are in-vocab
    assert "Video to Paragraph" in out  # validation table printed
    events = _jsonl(os.path.join(ckpt, "log.jsonl"))
    kinds = {e["event"] for e in events}
    assert {"word2vec_init", "train_step", "epoch_end", "validate"} <= kinds
    assert os.path.exists(os.path.join(ckpt, "config.json"))
    assert os.path.isdir(os.path.join(ckpt, "best"))

    # ---- 4. cmhse-eval, plain and sharded/gallery (SURVEY 3.2) ----------
    from cmhse_tpu.cli.evaluate import main as eval_main

    ranks_path = str(tmp_path / "ranks.jsonl")
    assert eval_main([ckpt, "--platform", "cpu", "--split", "val",
                      "--dump_ranks", ranks_path]) == 0
    plain = capsys.readouterr().out
    assert "Paragraph to Video" in plain and "rsum" in plain
    # per-query rank dump: one line per example, dataset keys, sane ranks
    rank_rows = _jsonl(ranks_path)
    val_keys = {f"v_val{i:03d}" for i in range(8)}
    assert {r["key"] for r in rank_rows} == val_keys
    assert all(1 <= r["v2p_rank"] <= len(val_keys) and
               1 <= r["p2v_rank"] <= len(val_keys) for r in rank_rows)

    ranks_sh = str(tmp_path / "ranks_sharded.jsonl")
    assert eval_main([ckpt, "--platform", "cpu", "--split", "val",
                      "--sharded", "--mode", "gallery",
                      "--dump_ranks", ranks_sh]) == 0
    sharded = capsys.readouterr().out
    # the per-query rank export is backend-independent: sharded == plain
    assert _jsonl(ranks_sh) == rank_rows

    def _rsum(text):
        return float([ln for ln in text.splitlines()
                      if ln.startswith("rsum")][0].split(":")[1])

    # sharded ranks are bit-identical to the single-device path
    assert _rsum(sharded) == _rsum(plain)

    # forced streaming rank counting (the large-gallery path) must agree on
    # this tiny gallery too — the dispatch boundary cannot move metrics;
    # also exercises the eval-side profiler trace flag
    prof_dir = str(tmp_path / "eval_profile")
    assert eval_main([ckpt, "--platform", "cpu", "--split", "val",
                      "--streaming", "--profile_dir", prof_dir]) == 0
    assert _rsum(capsys.readouterr().out) == _rsum(plain)
    import glob

    assert glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"),
                     recursive=True)

    # ---- 5. cmhse-import of a reference-style .pth.tar ------------------
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from torch_replica import TorchCMHSE

    from cmhse_tpu.cli.import_torch import main as import_main

    torch.manual_seed(0)
    tm = TorchCMHSE(len(vocab), WORD_DIM, FEAT, HIDDEN, EMBED,
                    hierarchical=True)
    pth = str(tmp_path / "model_best.pth.tar")
    torch.save({"model": tm.state_dict(), "epoch": 3, "best_rsum": 1.0}, pth)
    imported = str(tmp_path / "imported")
    assert import_main([pth, imported, "--platform", "cpu"]) == 0
    capsys.readouterr()

    # the imported dir drives the SAME eval CLI over the same data dir
    assert eval_main([imported, "--data_path", data_dir, "--platform", "cpu",
                      "--split", "val"]) == 0
    imp_out = capsys.readouterr().out
    assert "rsum" in imp_out

    # ---- 5b. cmhse-export: the TRAINED run goes back to torch -----------
    from cmhse_tpu.cli.export_torch import main as export_main

    back = str(tmp_path / "back_to_torch.pth.tar")
    assert export_main([ckpt, back, "--platform", "cpu"]) == 0
    capsys.readouterr()
    sd = torch.load(back, map_location="cpu", weights_only=True)["model"]
    tm_back = TorchCMHSE(len(vocab), WORD_DIM, FEAT, HIDDEN, EMBED,
                         hierarchical=True)
    missing, unexpected = tm_back.load_state_dict(sd)
    assert not missing and not unexpected  # torch consumes the trained run

    # ---- 6. cmhse-retrieve (serving surface; SURVEY 3.5) ----------------
    from cmhse_tpu.cli.retrieve import main as retrieve_main

    rng = np.random.RandomState(3)
    query = make_sentence(rng)
    assert retrieve_main([ckpt, "--platform", "cpu", "--split", "val",
                          "--query", query, "-k", "3"]) == 0
    ret = capsys.readouterr().out
    assert f"query: {query!r}" in ret
    hits = [ln for ln in ret.splitlines() if ln.strip().startswith("1.")]
    assert hits and "v_val" in hits[0]  # ranked rows name real gallery keys
    assert ret.count("score=") == 3

    # oversized k clamps to the valid gallery size instead of surfacing
    # -inf padding rows under a real key (VERDICT r2 weak 3)
    assert retrieve_main([ckpt, "--platform", "cpu", "--split", "val",
                          "--query", query, "-k", "99"]) == 0
    big = capsys.readouterr().out
    assert big.count("score=") == 8  # n_val valid rows
    assert "-inf" not in big

    # video->paragraph direction: a dataset key as the query
    assert retrieve_main([ckpt, "--platform", "cpu", "--split", "val",
                          "--query_video", "v_val000", "-k", "3"]) == 0
    v2p = capsys.readouterr().out
    assert "video query: 'v_val000'" in v2p
    assert v2p.count("score=") == 3

    # both directions in ONE invocation: the split is encoded once and both
    # galleries are built from the same tuple (review finding: this used to
    # run the dataset through the model twice)
    assert retrieve_main([ckpt, "--platform", "cpu", "--split", "val",
                          "--query", query, "--query_video", "v_val000",
                          "-k", "2"]) == 0
    both = capsys.readouterr().out
    assert f"query: {query!r}" in both and "video query: 'v_val000'" in both
    assert both.count("score=") == 4

    # unknown key fails loudly, not with a KeyError traceback
    with pytest.raises(SystemExit, match="not in the val split"):
        retrieve_main([ckpt, "--platform", "cpu", "--split", "val",
                       "--query_video", "v_nope", "-k", "3"])

    # mesh-sharded serving over a RESTORED checkpoint: orbax restore pins
    # params (and so the encoded query/gallery) to device 0, which used to
    # blow up shard_map with 'incompatible devices' — regression for the
    # _on_mesh placement fix in parallel/eval_sharded.py
    assert retrieve_main([ckpt, "--platform", "cpu", "--split", "val",
                          "--query", query, "--sharded", "-k", "3"]) == 0
    sh = capsys.readouterr().out
    assert sh.count("score=") == 3
    hits_sh = [ln for ln in sh.splitlines() if ln.strip().startswith("1.")]
    assert hits_sh == hits  # same top hit as the single-device path

    # interactive mode: encode once, answer a stream of stdin queries
    import io

    q2 = make_sentence(np.random.RandomState(9))
    monkeypatch.setattr("sys.stdin", io.StringIO(f"{query}\n\n{q2}\n"))
    assert retrieve_main([ckpt, "--platform", "cpu", "--split", "val",
                          "--interactive", "-k", "2"]) == 0
    inter = capsys.readouterr().out
    assert inter.count("query:") == 2  # blank line skipped
    assert inter.count("score=") == 4

    # ---- 7. cmhse-serve over the TRAINED run (daemon handler on the same
    # reference-layout dir; socket/binary legs live in test_serve_daemon) --
    from cmhse_tpu.cli import serve_daemon

    sctx = serve_daemon.build_context(ckpt, data_dir, "val")
    resp = serve_daemon._handle_request({"query": query, "k": 3}, sctx)
    assert "error" not in resp and len(resp["results"]) == 3
    # the daemon and the CLI agree on the top hit for the same query
    top_cli = hits[0].strip().split()[1]
    assert resp["results"][0]["key"] == top_cli
    assert serve_daemon._handle_request({"op": "stats"}, sctx)[
        "valid_rows"] == 8
