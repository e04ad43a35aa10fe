"""Golden-vector fidelity tests for the real-model (model2vec/potion) path.

The committed fixture (tests/fixtures/potion_mini/, regenerate with its
make_fixture.py) is a genuine model2vec-format artifact directory — a
potion-style Unigram tokenizer.json (NFKC + Metaspace, scored subword
vocab), a safetensors embedding table, config.json — plus goldens
computed by an independent numpy implementation of model2vec's encode
contract (the one the reference consumes at src/search/mod.rs:16,69,138:
tokenize without special tokens, truncate to max_length, gather, mean
pool, L2 normalize per config).

These tests drive semtools_tpu's production path — HFTokenizer +
_read_safetensors + StaticModel.encode — against those goldens: token
ids must match exactly, embeddings to 1e-6.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "potion_mini"


@pytest.fixture(scope="module")
def goldens():
    return np.load(FIXTURE / "goldens.npz", allow_pickle=True)


@pytest.fixture(scope="module")
def model():
    from semtools_tpu.models.static_model import StaticModel

    return StaticModel._from_pretrained_uncached(str(FIXTURE))


def test_artifact_dir_resolves_real_model(model):
    from semtools_tpu.models.tokenizer import HFTokenizer

    assert isinstance(model.tokenizer, HFTokenizer)
    assert model.normalize is True  # from config.json
    assert model.dim == 64
    assert model.name == str(FIXTURE)


def test_hf_tokenizer_ids_exact(goldens):
    from semtools_tpu.models.tokenizer import HFTokenizer

    tok = HFTokenizer(str(FIXTURE / "tokenizer.json"))
    texts = list(goldens["texts"])
    ids = tok.encode_batch(texts)
    for i, got in enumerate(ids):
        want = goldens["ids"][i][: goldens["lengths"][i]].tolist()
        assert list(got) == want, f"ids diverge for line {i}: {texts[i]!r}"
    # single-encode agrees with batch
    assert tok.encode(texts[0]) == list(ids[0])
    # <unk> handling: fully OOV soup still produces ids within the vocab
    oov = ids[texts.index("zzzzqqqq xxxyyy unseen-token-soup")]
    assert len(oov) > 0
    assert all(0 <= t < tok.vocab_size for t in oov)


def test_encode_matches_goldens_normalized(model, goldens):
    texts = list(goldens["texts"])
    got = np.asarray(model.encode(texts, max_length=2048))
    # 3e-6: fp32 summation order differs between XLA segment-sum pooling
    # and the numpy reference; observed max |diff| is ~1e-6.
    np.testing.assert_allclose(got, goldens["emb_norm"], rtol=0, atol=3e-6)
    # normalized rows are unit (or zero for the empty line)
    norms = np.linalg.norm(got, axis=1)
    empty_i = texts.index("")
    assert norms[empty_i] == 0.0
    keep = np.ones(len(texts), bool)
    keep[empty_i] = False
    np.testing.assert_allclose(norms[keep], 1.0, atol=1e-5)


def test_encode_single_matches_batch(model, goldens):
    texts = list(goldens["texts"])
    single = np.asarray(model.encode_single(texts[1]))
    np.testing.assert_allclose(single, goldens["emb_norm"][1], atol=1e-6)


def test_normalize_override_false(goldens):
    from semtools_tpu.models.static_model import StaticModel

    raw_model = StaticModel._from_pretrained_uncached(
        str(FIXTURE), normalize_override=False
    )
    texts = list(goldens["texts"])
    got = np.asarray(raw_model.encode(texts, max_length=2048))
    np.testing.assert_allclose(got, goldens["emb_raw"], rtol=0, atol=1e-6)


def test_truncation_at_max_length(model, goldens):
    text = str(goldens["trunc_text"][0])
    limit = int(goldens["trunc_max_length"])
    assert int(goldens["trunc_len"]) == limit  # the line exceeds the limit

    got = np.asarray(model.encode([text], max_length=limit))
    np.testing.assert_allclose(got, goldens["emb_trunc"], atol=1e-6)
    # and differs from the untruncated embedding (so the limit is real)
    full = np.asarray(model.encode([text], max_length=2048))
    assert not np.allclose(got, full, atol=1e-4)


def test_search_pipeline_with_real_model(model):
    """End-to-end: the real-artifact model drives the search core and the
    nearest line is the exact-match line (distance ~0 — the reference's
    observed behavior for near-exact matches, BASELINE.md)."""
    from semtools_tpu.search import Document, SearchConfig, search_documents

    lines = [
        "the quick brown fox jumps over the lazy dog",
        "attention mechanisms in transformer models",
        "semantic search over large document corpora",
    ]
    embs = np.asarray(model.encode(lines, max_length=2048))
    doc = Document(filename="f.txt", lines=lines, embeddings=embs)
    q = np.asarray(model.encode_single("attention mechanisms in transformer models"))
    results = search_documents([doc], q, SearchConfig(top_k=1, n_lines=0))
    assert results[0].start == 1
    assert results[0].distance < 1e-5


def test_bf16_safetensors_roundtrip(tmp_path):
    """_read_safetensors' BF16 branch against a real torch-written file."""
    import torch
    from safetensors.torch import save_file

    from semtools_tpu.models.static_model import _read_safetensors

    t = torch.randn(17, 8, dtype=torch.float32)
    save_file({"embeddings": t.to(torch.bfloat16)}, str(tmp_path / "m.safetensors"))
    got = _read_safetensors(str(tmp_path / "m.safetensors"))["embeddings"]
    want = t.to(torch.bfloat16).to(torch.float32).numpy()
    np.testing.assert_array_equal(got, want)


def test_cli_resolves_model_dir_env(tmp_path, monkeypatch, capsys):
    """SEMTOOLS_TPU_MODEL_DIR drives the full CLI with the real-artifact
    model — no fallback notice, real tokenizer ids behind the search."""
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setenv("SEMTOOLS_TPU_PLATFORM", "cpu")
    monkeypatch.setenv("SEMTOOLS_TPU_MODEL_DIR", str(FIXTURE))
    # fresh resolution (the memo may hold the fallback from other tests)
    from semtools_tpu.models import static_model

    monkeypatch.setattr(static_model, "_MODEL_CACHE", {})
    f = tmp_path / "a.txt"
    f.write_text(
        "the quick brown fox jumps over the lazy dog\n"
        "attention mechanisms in transformer models\n"
    )
    from semtools_tpu.cli import main

    assert main(["search", "attention mechanisms", str(f), "--top-k", "1", "-n", "0"]) == 0
    out = capsys.readouterr()
    assert "attention mechanisms in transformer models" in out.out
    assert "built-in deterministic embedder" not in out.err
