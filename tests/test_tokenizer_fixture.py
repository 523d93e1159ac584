"""Tokenizer byte-compat evidence (SURVEY.md section 3.4: retrieval parity
is impossible if token ids diverge).

The fixture below is the exact output of NLTK's Treebank word tokenizer —
the per-sentence core of ``word_tokenize``, which is what the reference's
``vocab.py`` ran. For single-sentence captions (ActivityNet Captions and
DiDeMo provide one caption per clip/moment) Punkt's sentence split is a
no-op, so these sequences are byte-identical to the reference's
``word_tokenize`` output. The expected values are vendored (generated once
with nltk's TreebankWordTokenizer and hand-checked against treebank
conventions: contraction splits, `` ''-style quote conversion, sentence-
final period detachment) so the test needs no downloadable NLTK data.
"""

import pytest

from cmhse_tpu.data.vocab import Vocabulary, build_vocab, tokenize, tokenizer_backend

# (lowercased caption, expected word_tokenize/Treebank token sequence)
FIXTURE = [
    ("a man doesn't run", ["a", "man", "does", "n't", "run"]),
    ("he's walking fast, isn't he?",
     ["he", "'s", "walking", "fast", ",", "is", "n't", "he", "?"]),
    ("the dog (a poodle) barks.",
     ["the", "dog", "(", "a", "poodle", ")", "barks", "."]),
    ('she said "hello world"',
     ["she", "said", "``", "hello", "world", "''"]),
    ("a well-known actor jumps; then runs.",
     ["a", "well-known", "actor", "jumps", ";", "then", "runs", "."]),
    ("i cannot swim", ["i", "can", "not", "swim"]),
    ("they're at the u.s. open",
     ["they", "'re", "at", "the", "u.s.", "open"]),
    ("it's 3.5 meters long!", ["it", "'s", "3.5", "meters", "long", "!"]),
    ("don't stop... keep going",
     ["do", "n't", "stop", "...", "keep", "going"]),
    ("the man, wearing a red shirt, runs.",
     ["the", "man", ",", "wearing", "a", "red", "shirt", ",", "runs", "."]),
]


def test_backend_is_nltk_not_regex():
    """The non-parity regex fallback must not engage while nltk exists."""
    assert tokenizer_backend() in ("punkt", "treebank")


@pytest.mark.parametrize("caption,expected", FIXTURE,
                         ids=[f[0][:24] for f in FIXTURE])
def test_tokenize_matches_reference_fixture(caption, expected):
    assert tokenize(caption) == expected
    # lowercasing is part of the contract
    assert tokenize(caption.upper()) == expected


def test_flat_mode_multisentence_paragraph_parity(tmp_path):
    """VERDICT r2 missing 4: flat mode used to tokenize the JOINED paragraph
    string — exactly where the treebank backend diverges from
    ``word_tokenize`` (mid-string sentence-final periods stay attached).
    The fix encodes per sentence (the ground-truth boundaries the captions
    json carries) and concatenates under one <start>/<end> frame, which is
    what ``word_tokenize`` would produce when Punkt splits correctly."""
    import json

    import numpy as np

    from cmhse_tpu.data.datasets import PrecompDataset

    sents = ["the dog barks.", "a man runs."]
    # word_tokenize(joined) with a correct sentence split (the reference):
    reference_tokens = ["the", "dog", "barks", ".", "a", "man", "runs", "."]
    vocab = build_vocab(sents * 2, threshold=1)

    feat_dir = tmp_path / "features"
    feat_dir.mkdir()
    np.save(feat_dir / "v_x.npy", np.zeros((6, 4), np.float32))
    (tmp_path / "train_captions.json").write_text(json.dumps(
        {"v_x": {"timestamps": [[0, 3], [3, 6]], "sentences": sents,
                 "duration": 6.0}}
    ))
    ds = PrecompDataset(str(tmp_path), "train", vocab, feat_dim=4, flat=True)
    ex = ds[0]
    assert len(ex.sentences) == 1 and len(ex.clips) == 1
    ids = list(ex.sentences[0])
    assert ids[0] == vocab(Vocabulary.START)
    assert ids[-1] == vocab(Vocabulary.END)
    assert [vocab.idx2word[i] for i in ids[1:-1]] == reference_tokens

    # the hole this closes: on a Punkt-less image the joined-string path
    # really does diverge (kept as evidence the fix is load-bearing)
    if tokenizer_backend() == "treebank":
        assert tokenize(" ".join(sents)) != reference_tokens


def test_vocab_ids_stable_from_fixture_corpus():
    """End-to-end: fixture captions -> vocabulary -> encode. Pins the id
    layout (<pad>=0 <start>=1 <end>=2 <unk>=3, then thresholded words in
    corpus first-occurrence order — the reference's counter.items() order
    on modern Python) and the <start>/<end> framing the reference used."""
    corpus = [c for c, _ in FIXTURE] * 2  # x2 so threshold=2 keeps all
    vocab = build_vocab(corpus, threshold=2)
    assert vocab(Vocabulary.PAD) == 0
    assert vocab(Vocabulary.START) == 1
    assert vocab(Vocabulary.END) == 2
    assert vocab(Vocabulary.UNK) == 3
    ids = vocab.encode("a man doesn't run")
    assert ids[0] == 1 and ids[-1] == 2
    assert vocab.idx2word[ids[1]] == "a"
    assert [vocab.idx2word[i] for i in ids[1:-1]] == \
        ["a", "man", "does", "n't", "run"]
    # unseen word maps to <unk>
    assert vocab("zebra") == 3
