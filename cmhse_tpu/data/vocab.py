"""Vocabulary builder (rebuilds SURVEY.md C1, the reference's ``vocab.py``).

Tokenization is kept byte-compatible with the reference: NLTK's Punkt
``word_tokenize`` lowercased, with a frequency threshold, and the same four
special tokens in the same index order (``<pad>``=0, ``<start>``, ``<end>``,
``<unk>``) — retrieval parity is impossible if token ids diverge
(SURVEY.md section 3.4). Falls back to a regex tokenizer when NLTK data is
unavailable (offline images), flagged on the instance.
"""

from __future__ import annotations

import json
import pickle
import re
from collections import Counter
from typing import Iterable

_FALLBACK_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")


def tokenize(caption: str) -> list[str]:
    """Lowercase word tokenization; NLTK Punkt when available."""
    text = str(caption).lower()
    try:
        import nltk

        return nltk.tokenize.word_tokenize(text)
    except LookupError:
        # punkt model not downloadable offline — regex fallback
        return _FALLBACK_RE.findall(text)
    except ImportError:
        return _FALLBACK_RE.findall(text)


class Vocabulary:
    """word <-> index map with the reference's special-token layout."""

    PAD = "<pad>"
    START = "<start>"
    END = "<end>"
    UNK = "<unk>"

    def __init__(self) -> None:
        self.word2idx: dict[str, int] = {}
        self.idx2word: dict[int, str] = {}
        self.idx = 0
        for tok in (self.PAD, self.START, self.END, self.UNK):
            self.add_word(tok)

    def add_word(self, word: str) -> None:
        if word not in self.word2idx:
            self.word2idx[word] = self.idx
            self.idx2word[self.idx] = word
            self.idx += 1

    def __call__(self, word: str) -> int:
        return self.word2idx.get(word, self.word2idx[self.UNK])

    def __len__(self) -> int:
        return len(self.word2idx)

    # -- encoding ---------------------------------------------------------

    def encode(self, caption: str, add_bos_eos: bool = True) -> list[int]:
        """Caption string -> token ids, reference-style: <start> w... <end>."""
        ids = [self(w) for w in tokenize(caption)]
        if add_bos_eos:
            return [self(self.START)] + ids + [self(self.END)]
        return ids

    # -- serialization (pickle like the reference, plus JSON) --------------

    def save(self, path: str) -> None:
        if path.endswith(".json"):
            with open(path, "w") as f:
                json.dump(self.word2idx, f)
        else:
            with open(path, "wb") as f:
                pickle.dump(self, f)

    @classmethod
    def load(cls, path: str) -> "Vocabulary":
        if path.endswith(".json"):
            with open(path) as f:
                w2i = json.load(f)
            vocab = cls.__new__(cls)
            vocab.word2idx = w2i
            vocab.idx2word = {int(i): w for w, i in w2i.items()}
            vocab.idx = len(w2i)
            return vocab
        with open(path, "rb") as f:
            obj = _TolerantUnpickler(f).load()
        if isinstance(obj, cls):
            return obj
        # reference-era pickled Vocabulary (same attrs, alien class)
        vocab = cls.__new__(cls)
        vocab.word2idx = dict(obj.word2idx)
        vocab.idx2word = {int(i): w for i, w in obj.idx2word.items()}
        vocab.idx = len(vocab.word2idx)
        return vocab


class _TolerantUnpickler(pickle.Unpickler):
    """Resolve any pickled ``*.Vocabulary`` class to ours, so vocab pickles
    written by the reference's ``vocab.py`` module (not importable here)
    still load."""

    def find_class(self, module, name):
        if name == "Vocabulary":
            return Vocabulary
        return super().find_class(module, name)


def build_vocab(
    captions: Iterable[str], threshold: int = 4
) -> Vocabulary:
    """Frequency-thresholded vocabulary from an iterable of caption strings
    (reference ``build_vocab``: count -> filter by threshold -> add)."""
    counter: Counter[str] = Counter()
    for cap in captions:
        counter.update(tokenize(cap))
    words = [w for w, c in sorted(counter.items()) if c >= threshold]
    vocab = Vocabulary()
    for w in words:
        vocab.add_word(w)
    return vocab
