"""Tokenizers for static embedding models.

Two implementations share one interface (``encode_batch(texts) -> list of
id-lists``):

- :class:`HFTokenizer` wraps a HuggingFace ``tokenizers`` file
  (``tokenizer.json``) for model2vec-format artifacts such as
  minishlab/potion-multilingual-128M — the model the reference loads at
  src/search/mod.rs:16. Tokenization runs on host; only the integer ids
  cross to the TPU.
- :class:`HashTokenizer` is the hermetic fallback used when no model
  artifacts are on disk (this build environment has no network egress).
  It maps words and character n-grams onto a fixed hashed vocabulary,
  fastText-style, so the built-in model is fully deterministic and needs
  no downloaded files.
"""

from __future__ import annotations

import re
from typing import List, Sequence

from semtools_tpu.utils.hashing import fnv1a_64

_WORD_RE = re.compile(r"[\w]+|[^\w\s]", re.UNICODE)


class HashTokenizer:
    """Deterministic hashed-vocabulary tokenizer.

    Every word contributes its own hash id plus ids for its character
    n-grams (with boundary markers), giving sub-word robustness to typos
    and morphology. Ids land in ``[0, vocab_size)`` via modulo.
    """

    def __init__(self, vocab_size: int = 1 << 16, ngram_min: int = 3, ngram_max: int = 4):
        self.vocab_size = vocab_size
        self.ngram_min = ngram_min
        self.ngram_max = ngram_max

    def _word_ids(self, word: str) -> List[int]:
        ids = [fnv1a_64(word.encode("utf-8")) % self.vocab_size]
        if len(word) > self.ngram_min:
            marked = f"<{word}>"
            for n in range(self.ngram_min, self.ngram_max + 1):
                for i in range(len(marked) - n + 1):
                    gram = marked[i : i + n]
                    ids.append(fnv1a_64(("#" + gram).encode("utf-8")) % self.vocab_size)
        return ids

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for word in _WORD_RE.findall(text.lower()):
            ids.extend(self._word_ids(word))
        return ids

    def encode_batch(self, texts: Sequence[str]) -> List[List[int]]:
        return [self.encode(t) for t in texts]


class HFTokenizer:
    """Wrapper around a HuggingFace ``tokenizers`` tokenizer.json file."""

    def __init__(self, tokenizer_file: str):
        from tokenizers import Tokenizer  # lazy: only needed for real artifacts

        self._tok = Tokenizer.from_file(tokenizer_file)
        self.vocab_size = self._tok.get_vocab_size()

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text, add_special_tokens=False).ids

    def encode_batch(self, texts: Sequence[str]) -> List[List[int]]:
        encodings = self._tok.encode_batch(list(texts), add_special_tokens=False)
        return [e.ids for e in encodings]
