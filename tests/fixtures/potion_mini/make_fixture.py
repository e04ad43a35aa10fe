"""Generate the potion_mini golden fixture (committed; rerun to refresh).

Builds a REAL model2vec-format artifact directory — a HuggingFace
``tokenizers`` Unigram tokenizer.json structured like
minishlab/potion-multilingual-128M's (NFKC normalizer, Metaspace
pre-tokenizer/decoder, scored unigram vocab with <unk>), a
``model.safetensors`` embedding table, and a ``config.json`` — plus
``goldens.npz`` with token ids and embedding vectors for the fixture
lines, computed by an INDEPENDENT implementation of model2vec's encode
semantics (tokenize with add_special_tokens=False, truncate to
max_length tokens, gather rows, mean-pool, optional L2 normalize;
the contract the reference consumes at src/search/mod.rs:69,138 via
model2vec-rs). The tests then drive semtools_tpu's HFTokenizer +
StaticModel end-to-end against these goldens: any divergence in the
safetensors reader, tokenizer wrapper, truncation, pooling, or
normalization fails at 1e-6.

Run from the repo root:  python tests/fixtures/potion_mini/make_fixture.py
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
DIM = 64
MAX_LENGTH_DEFAULT = 2048

# ~20 fixture lines: multilingual text, punctuation, casing, digits,
# whitespace edge cases, an empty line, an OOV-ish line, and one line
# long enough to exercise truncation.
LINES = [
    "the quick brown fox jumps over the lazy dog",
    "attention mechanisms in transformer models",
    "The Quick Brown Fox!",
    "semantic search over large document corpora",
    "ein schneller brauner fuchs",
    "la recherche sémantique est rapide",
    "細かいところまで気を配る",
    "векторное представление текста",
    "mixed language: fox und fuchs et renard",
    "numbers 123 and 456.789 parse fine",
    "punctuation, is; (handled) — correctly!",
    "   leading and trailing whitespace   ",
    "",
    "zzzzqqqq xxxyyy unseen-token-soup",
    "a",
    "word word word repetition test",
    "tab\tseparated\tfields here",
    "newline-free single line of text",
    "UPPERCASE LINE WITH SHOUTING",
    "the fox, the dog, and the transformer walk into a corpus",
]
# Truncation probe: far more tokens than the truncation limit used in
# the test (64), so truncated/untruncated embeddings must differ.
TRUNC_LINE = " ".join(["fox dog the"] * 200)


def build_tokenizer():
    from tokenizers import Tokenizer, decoders, normalizers, pre_tokenizers
    from tokenizers.models import Unigram

    # Subword-ish vocabulary: whole words from the fixture lines (in
    # Metaspace form), plus single characters for fallback coverage.
    words = set()
    for line in LINES + [TRUNC_LINE]:
        for w in line.lower().split():
            words.add("▁" + w)
    chars = set()
    for line in LINES + [TRUNC_LINE]:
        for ch in line.lower():
            if not ch.isspace():
                chars.add(ch)
    vocab = [("<unk>", 0.0)]
    # Longer pieces get better (less negative) scores so the unigram
    # segmentation prefers whole words — same shape as a trained
    # SentencePiece vocab.
    for w in sorted(words):
        vocab.append((w, -2.0 - 0.01 * len(w)))
    for c in sorted(chars):
        vocab.append((c, -8.0))
    vocab.append(("▁", -9.0))

    tok = Tokenizer(Unigram(vocab, unk_id=0, byte_fallback=False))
    tok.normalizer = normalizers.Sequence(
        [normalizers.NFKC(), normalizers.Lowercase()]
    )
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always"
    )
    tok.decoder = decoders.Metaspace(
        replacement="▁", prepend_scheme="always"
    )
    return tok


def reference_encode(tok, table: np.ndarray, texts, max_length, normalize):
    """Independent numpy re-statement of model2vec encode semantics."""
    out = np.zeros((len(texts), table.shape[1]), np.float32)
    all_ids = []
    for i, text in enumerate(texts):
        ids = tok.encode(text, add_special_tokens=False).ids[:max_length]
        all_ids.append(ids)
        if not ids:
            continue
        vec = table[np.asarray(ids)].mean(axis=0)
        if normalize:
            nrm = np.linalg.norm(vec)
            if nrm > 0:
                vec = vec / nrm
        out[i] = vec
    return all_ids, out


def main():
    tok = build_tokenizer()
    tok.save(str(HERE / "tokenizer.json"))

    vocab_size = tok.get_vocab_size()
    rng = np.random.Generator(np.random.Philox(20260816))
    table = rng.standard_normal((vocab_size, DIM)).astype(np.float32) / np.sqrt(DIM)

    from safetensors.numpy import save_file

    save_file({"embeddings": table}, str(HERE / "model.safetensors"))
    (HERE / "config.json").write_text(
        json.dumps(
            {
                "model_type": "model2vec",
                "architectures": ["StaticModel"],
                "normalize": True,
                "hidden_dim": DIM,
                "seq_length": 1000000,
            },
            indent=2,
        )
        + "\n"
    )

    texts = LINES + [TRUNC_LINE]
    ids, emb_norm = reference_encode(tok, table, texts, MAX_LENGTH_DEFAULT, True)
    _, emb_raw = reference_encode(tok, table, texts, MAX_LENGTH_DEFAULT, False)
    # Truncation goldens for the long line at a small limit (64 tokens).
    trunc_ids, emb_trunc = reference_encode(tok, table, [TRUNC_LINE], 64, True)

    lengths = np.array([len(x) for x in ids], np.int32)
    padded = np.zeros((len(ids), int(lengths.max())), np.int32)
    for i, x in enumerate(ids):
        padded[i, : len(x)] = x

    np.savez(
        HERE / "goldens.npz",
        texts=np.array(texts, dtype=object),
        ids=padded,
        lengths=lengths,
        emb_norm=emb_norm,
        emb_raw=emb_raw,
        trunc_text=np.array([TRUNC_LINE], dtype=object),
        trunc_max_length=np.int32(64),
        trunc_len=np.int32(len(trunc_ids[0])),
        emb_trunc=emb_trunc,
    )
    print(
        f"potion_mini fixture written: vocab={vocab_size}, dim={DIM}, "
        f"{len(texts)} golden lines (long line: {lengths[-1]} tokens)"
    )


if __name__ == "__main__":
    main()
