"""Behavioral tests for the search core.

Property-style assertions model the reference's own test strategy
(src/search/mod.rs:218-464): embeddings are treated as opaque; what is
checked is ordering, top-k/threshold semantics, and context-window math.
"""

import numpy as np
import pytest

from semtools_tpu.search import (
    SearchConfig,
    create_document_from_content,
    search_documents,
    search_files,
)


def make_doc(model, filename, lines, ignore_case=False):
    return create_document_from_content(filename, "\n".join(lines), model, ignore_case)


def config(**kw):
    base = dict(n_lines=3, top_k=3, max_distance=None, ignore_case=False)
    base.update(kw)
    return SearchConfig(**base)


def test_search_documents_basic(fallback_model):
    doc1 = make_doc(fallback_model, "file1.txt", ["hello world", "goodbye world", "test line"])
    doc2 = make_doc(fallback_model, "file2.txt", ["another test", "more content"])
    q = fallback_model.encode_single("test query")
    results = search_documents([doc1, doc2], q, config())
    assert results
    for a, b in zip(results, results[1:]):
        assert a.distance <= b.distance


def test_max_distance_filters(fallback_model):
    doc = make_doc(fallback_model, "t.txt", ["line 1", "line 2", "line 3"])
    q = fallback_model.encode_single("test")
    results = search_documents([doc], q, config(max_distance=0.5))
    for r in results:
        assert r.distance < 0.5


def test_top_k_limit(fallback_model):
    doc = make_doc(fallback_model, "t.txt", [f"line {i}" for i in range(5)])
    q = fallback_model.encode_single("test")
    results = search_documents([doc], q, config(top_k=2))
    assert len(results) <= 2


def test_threshold_overrides_top_k(fallback_model):
    doc = make_doc(fallback_model, "t.txt", [f"totally different words {i}" for i in range(10)])
    q = fallback_model.encode_single("totally different words 0")
    results = search_documents([doc], q, config(top_k=1, max_distance=10.0))
    # Threshold mode ignores top_k and returns every line under threshold
    assert len(results) == 10


def test_context_window_size(fallback_model):
    doc = make_doc(fallback_model, "t.txt", [f"line {i}" for i in range(6)])
    q = fallback_model.encode_single("test")
    results = search_documents([doc], q, config(n_lines=1))
    assert results
    r = results[0]
    if 0 < r.match_line < 5:
        assert len(r.lines) == 3


def test_context_clamped_at_boundaries(fallback_model):
    doc = make_doc(fallback_model, "small.txt", ["first", "second"])
    q = fallback_model.encode_single("first")
    results = search_documents([doc], q, config(n_lines=5))
    assert results
    r = results[0]
    assert r.start == 0
    assert r.end == 2
    assert len(r.lines) <= 2


def test_multiple_documents(fallback_model):
    doc1 = make_doc(fallback_model, "file1.txt", ["apple", "banana"])
    doc2 = make_doc(fallback_model, "file2.txt", ["orange", "grape"])
    q = fallback_model.encode_single("fruit")
    results = search_documents([doc1, doc2], q, config(top_k=4))
    names = {r.filename for r in results}
    assert names == {"file1.txt", "file2.txt"}


def test_empty_documents(fallback_model):
    q = fallback_model.encode_single("test")
    assert search_documents([], q, config()) == []


def test_ignore_case_matches(fallback_model):
    doc = make_doc(
        fallback_model, "mixed.txt", ["Hello World", "GOODBYE WORLD", "Test Line"], ignore_case=True
    )
    q = fallback_model.encode_single("hello world")
    results = search_documents([doc], q, config(ignore_case=True))
    assert results
    assert results[0].match_line == 0
    assert results[0].distance < 1e-5
    # Original casing is preserved in output
    assert results[0].lines[0] == "Hello World"


def test_create_document_from_content(fallback_model):
    doc = create_document_from_content("t.txt", "Line 1\nLine 2\nLine 3", fallback_model, False)
    assert doc.filename == "t.txt"
    assert doc.lines == ["Line 1", "Line 2", "Line 3"]
    assert doc.embeddings.shape[0] == 3


def test_create_document_from_empty_content(fallback_model):
    assert create_document_from_content("e.txt", "", fallback_model, False) is None


def test_trailing_newline_does_not_add_line(fallback_model):
    doc = create_document_from_content("t.txt", "a\nb\n", fallback_model, False)
    assert doc.lines == ["a", "b"]


def test_crlf_and_formfeed_handling(fallback_model):
    # \r\n strips the \r; \f must NOT split a line (Rust lines() parity)
    doc = create_document_from_content("t.txt", "a\r\nb\fc\n", fallback_model, False)
    assert doc.lines == ["a", "b\fc"]


def test_search_files(fallback_model, tmp_path):
    f1 = tmp_path / "a.txt"
    f1.write_text("the quick brown fox\njumps over\nthe lazy dog\n")
    f2 = tmp_path / "b.txt"
    f2.write_text("completely unrelated text\nabout databases\n")
    results = search_files([str(f1), str(f2)], "quick brown fox", fallback_model, config(top_k=1))
    assert results[0].filename == str(f1)
    assert results[0].match_line == 0
    assert results[0].distance < 0.2


def test_search_files_missing_file_raises(fallback_model, tmp_path):
    with pytest.raises(OSError):
        search_files([str(tmp_path / "missing.txt")], "q", fallback_model, config())


def test_exact_line_match_has_near_zero_distance(fallback_model):
    lines = ["alpha beta gamma", "delta epsilon", "zeta eta theta"]
    doc = make_doc(fallback_model, "t.txt", lines)
    q = fallback_model.encode_single("delta epsilon")
    results = search_documents([doc], q, config(top_k=1))
    assert results[0].match_line == 1
    assert results[0].distance < 1e-5


def test_duck_typed_model_without_host_kwarg(tmp_path):
    """create_documents_from_contents(host=True) must keep working with
    models whose encode() lacks the host kwarg (round-2 review)."""
    import numpy as np

    from semtools_tpu.search import create_documents_from_contents

    class OldModel:
        dim = 4

        def encode(self, texts, max_length=2048):
            import jax.numpy as jnp

            return jnp.ones((len(texts), 4), jnp.float32)

        def encode_single(self, text):
            return np.ones(4, np.float32)

    docs = create_documents_from_contents(
        [("/a.txt", "one\ntwo\n")], OldModel(), False, host=True
    )
    assert len(docs) == 1
    assert isinstance(docs[0].embeddings, np.ndarray)
    assert docs[0].embeddings.shape == (2, 4)


def test_row_slice_views_share_one_parent(fallback_model):
    """The per-document split of a batched encode must not issue one
    device op per document: documents hold lazy _RowSlice views and the
    corpus assembly hands the scan the parent matrix itself."""
    from semtools_tpu.search import _RowSlice, _corpus_of, create_documents_from_contents

    docs = create_documents_from_contents(
        [("a", "l1\nl2\nl3"), ("b", "l4\nl5")], fallback_model, False
    )
    assert all(isinstance(d.embeddings, _RowSlice) for d in docs)
    assert docs[0].embeddings.parent is docs[1].embeddings.parent
    assert docs[0].embeddings.shape == (3, fallback_model.dim)
    assert len(docs[1].embeddings) == 2

    corpus, owners = _corpus_of(docs)
    assert corpus is docs[0].embeddings.parent  # zero-copy full coverage
    assert len(owners) == 5

    # a filtered subset falls back to materialization, not the parent
    corpus2, owners2 = _corpus_of([docs[1]])
    assert corpus2.shape[0] == 2
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(corpus2), np.asarray(corpus)[3:5], atol=0
    )
    # __array__ protocol: np.asarray on a view materializes the rows
    np.testing.assert_allclose(
        np.asarray(docs[0].embeddings), np.asarray(corpus)[:3], atol=0
    )
