"""Workspace store behavioral tests.

Modeled on the reference's store test coverage (src/workspace/store.rs:
717-1375): synthetic vectors in temp dirs; upsert idempotency via
deterministic ids; filtered search with thresholds; delete/prune; change
detection incl. version/model invalidation; persistence across reopen.
"""

import os

import numpy as np
import pytest

from semtools_tpu.store import (
    CURRENT_EMBEDDING_VERSION,
    DocMeta,
    LineEmbedding,
    Store,
)


def unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


@pytest.fixture()
def store(tmp_path):
    s = Store(str(tmp_path / "ws"), dim=8)
    yield s
    s.close()


def basis(i):
    v = np.zeros(8, np.float32)
    v[i] = 1.0
    return v


def test_upsert_and_search(store):
    store.upsert_document_lines("a.txt", np.stack([basis(0), basis(1)]))
    store.upsert_document_lines("b.txt", np.stack([basis(2)]))
    hits = store.search_line_embeddings(basis(1), ["a.txt", "b.txt"], top_k=2)
    assert hits[0].path == "a.txt"
    assert hits[0].line_number == 1
    assert abs(hits[0].distance) < 1e-6
    assert len(hits) == 2


def test_search_filters_to_subset(store):
    store.upsert_document_lines("a.txt", np.stack([basis(0)]))
    store.upsert_document_lines("b.txt", np.stack([basis(0)]))
    hits = store.search_line_embeddings(basis(0), ["b.txt"], top_k=10)
    assert {h.path for h in hits} == {"b.txt"}


def test_threshold_truncates_to_top_k(store):
    # Workspace-mode semantics: threshold AND top_k both apply
    mat = np.stack([unit(basis(0) + 0.1 * basis(i)) for i in range(1, 6)])
    store.upsert_document_lines("a.txt", mat)
    hits = store.search_line_embeddings(basis(0), ["a.txt"], top_k=2, max_distance=0.9)
    assert len(hits) == 2


def test_upsert_replaces_idempotently(store):
    store.upsert_document_lines("a.txt", np.stack([basis(0), basis(1)]))
    store.upsert_document_lines("a.txt", np.stack([basis(2), basis(3), basis(4)]))
    assert store.count_line_embeddings() == 3
    hits = store.search_line_embeddings(basis(0), ["a.txt"], top_k=1)
    assert hits[0].distance > 0.5  # basis(0) no longer present


def test_upsert_line_embeddings_groups_by_path(store):
    les = [
        LineEmbedding("x.txt", 1, basis(1)),
        LineEmbedding("x.txt", 0, basis(0)),
        LineEmbedding("y.txt", 0, basis(2)),
    ]
    store.upsert_line_embeddings(les)
    assert store.count_line_embeddings() == 3
    hits = store.search_line_embeddings(basis(0), ["x.txt"], top_k=1)
    assert hits[0].line_number == 0


def test_upsert_line_embeddings_rejects_gaps(store):
    with pytest.raises(ValueError):
        store.upsert_line_embeddings([LineEmbedding("x.txt", 5, basis(0))])


def test_metadata_roundtrip(store):
    meta = DocMeta("a.txt", 123, 456, CURRENT_EMBEDDING_VERSION)
    store.upsert_document_metadata([meta])
    got = store.get_existing_docs(["a.txt", "zzz.txt"])
    assert list(got) == ["a.txt"]
    assert got["a.txt"].size_bytes == 123
    assert got["a.txt"].mtime == 456
    assert store.count_documents() == 1


def test_delete_documents(store):
    store.upsert_document_lines("a.txt", np.stack([basis(0)]))
    store.upsert_document_metadata([DocMeta("a.txt", 1, 1)])
    store.upsert_document_lines("b.txt", np.stack([basis(1)]))
    store.upsert_document_metadata([DocMeta("b.txt", 1, 1)])

    store.delete_documents(["a.txt"])
    assert store.count_documents() == 1
    assert store.count_line_embeddings() == 1
    assert store.get_all_document_paths() == ["b.txt"]
    hits = store.search_line_embeddings(basis(0), ["a.txt", "b.txt"], top_k=5)
    assert {h.path for h in hits} == {"b.txt"}


def test_slot_reuse_after_delete(store):
    store.upsert_document_lines("a.txt", np.stack([basis(0), basis(1)]))
    cap_before = store._capacity()
    store.delete_line_embeddings(["a.txt"])
    store.upsert_document_lines("b.txt", np.stack([basis(2), basis(3)]))
    assert store._capacity() == cap_before  # freed range was reused


def test_persistence_across_reopen(tmp_path):
    path = str(tmp_path / "ws")
    with Store(path, dim=8) as s:
        s.upsert_document_lines("a.txt", np.stack([basis(0), basis(5)]))
        s.upsert_document_metadata([DocMeta("a.txt", 9, 9)])
    with Store(path, dim=8) as s:
        assert s.count_documents() == 1
        hits = s.search_line_embeddings(basis(5), ["a.txt"], top_k=1)
        assert hits[0].line_number == 1


def test_analyze_document_states(tmp_path):
    f = tmp_path / "doc.txt"
    f.write_text("hello\nworld\n")
    with Store(str(tmp_path / "ws"), dim=8) as s:
        states = s.analyze_document_states([str(f)])
        assert [st.kind for st in states] == ["new"]
        assert states[0].info.content == "hello\nworld\n"

        s.upsert_document_metadata([states[0].info.meta])
        states = s.analyze_document_states([str(f)])
        assert [st.kind for st in states] == ["unchanged"]

        # touch mtime+size
        f.write_text("hello\nworld\nmore\n")
        states = s.analyze_document_states([str(f)])
        assert [st.kind for st in states] == ["changed"]


def test_analyze_skips_missing_files(tmp_path):
    with Store(str(tmp_path / "ws"), dim=8) as s:
        states = s.analyze_document_states([str(tmp_path / "missing.txt")])
        assert states == []


def test_version_mismatch_forces_reembed(tmp_path):
    f = tmp_path / "doc.txt"
    f.write_text("x\n")
    with Store(str(tmp_path / "ws"), dim=8) as s:
        st = os.stat(f)
        old = DocMeta(str(f), st.st_size, int(st.st_mtime), CURRENT_EMBEDDING_VERSION - 1)
        s.upsert_document_metadata([old])
        states = s.analyze_document_states([str(f)])
        assert [x.kind for x in states] == ["changed"]


def test_model_change_invalidates_store(tmp_path):
    path = str(tmp_path / "ws")
    f = tmp_path / "doc.txt"
    f.write_text("x\n")
    with Store(path, dim=8, model_name="model-A") as s:
        st = os.stat(f)
        s.upsert_document_metadata(
            [DocMeta(str(f), st.st_size, int(st.st_mtime), CURRENT_EMBEDDING_VERSION)]
        )
        assert [x.kind for x in s.analyze_document_states([str(f)])] == ["unchanged"]
    with Store(path, dim=8, model_name="model-B") as s:
        assert [x.kind for x in s.analyze_document_states([str(f)])] == ["changed"]


def test_empty_subset_and_zero_topk(store):
    store.upsert_document_lines("a.txt", np.stack([basis(0)]))
    assert store.search_line_embeddings(basis(0), [], top_k=5) == []
    assert store.search_line_embeddings(basis(0), ["a.txt"], top_k=0) == []


def test_stats(store):
    store.upsert_document_lines("a.txt", np.stack([basis(0), basis(1)]))
    store.upsert_document_metadata([DocMeta("a.txt", 1, 1)])
    stats = store.get_stats()
    assert stats.total_documents == 1
    assert stats.total_lines == 2
    assert stats.has_index


def test_bulk_upsert_duplicate_paths_last_wins(tmp_path):
    import numpy as np

    from semtools_tpu.store.store import Store

    s = Store(str(tmp_path / "dup"), dim=8)
    a = np.eye(8, dtype=np.float32)[:3]
    b = np.eye(8, dtype=np.float32)[3:6]
    s.upsert_documents_bulk([("/x.txt", a), ("/x.txt", b)])
    got = s.search_line_embeddings(np.eye(8, dtype=np.float32)[4], ["/x.txt"], top_k=1)
    assert got[0].line_number == 1  # row 4 of eye == b[1]
    assert s.count_line_embeddings() == 3
    # free list consistent: another upsert reuses space without corruption
    s.upsert_documents_bulk([("/x.txt", a)])
    assert s.count_line_embeddings() == 3
    s.close()


def test_bulk_upsert_crash_before_commit_preserves_old_vectors(tmp_path):
    # Copy-on-write ordering: replaced ranges are freed only AFTER the docs
    # rows commit. A failure at commit time (simulating a crash in the
    # write->commit window) must leave the previously committed vectors
    # untouched — the batch's fresh allocations may not clobber them.
    s = Store(str(tmp_path / "cow"), dim=8)
    a_old = np.stack([basis(0), basis(1), basis(2)])
    b_old = np.stack([basis(3), basis(4)])
    s.upsert_documents_bulk([("/a.txt", a_old), ("/b.txt", b_old)])

    real_db = s.db

    class FailingCommit:
        def __init__(self, conn):
            self._conn = conn

        def commit(self):
            raise RuntimeError("simulated crash at commit")

        def __getattr__(self, name):
            return getattr(self._conn, name)

    s.db = FailingCommit(real_db)
    a_new = np.stack([basis(5)])          # shrinks: old range partly freed
    b_new = np.stack([basis(6)] * 4)      # grows: would love a's old slots
    with pytest.raises(RuntimeError):
        s.upsert_documents_bulk([("/a.txt", a_new), ("/b.txt", b_new)])
    s.db = real_db
    s.db.rollback()  # sqlite side of the crash: pending tx is lost

    # Old state must be fully intact (bytes AND metadata).
    for i, q in enumerate([basis(0), basis(1), basis(2)]):
        hit = s.search_line_embeddings(q, ["/a.txt", "/b.txt"], top_k=1)[0]
        assert (hit.path, hit.line_number) == ("/a.txt", i)
        assert hit.distance < 1e-6
    for i, q in enumerate([basis(3), basis(4)]):
        hit = s.search_line_embeddings(q, ["/a.txt", "/b.txt"], top_k=1)[0]
        assert (hit.path, hit.line_number) == ("/b.txt", i)
        assert hit.distance < 1e-6
    s.close()


def test_subset_duplicate_paths_deduped(store):
    store.upsert_document_lines("a.txt", np.stack([basis(0), basis(1)]))
    store.upsert_document_lines("b.txt", np.stack([basis(2)]))
    # Duplicated subset path: must not duplicate corpus rows/results, and
    # must NOT be misclassified as a full-store query (2 ranges == 2 valid
    # docs by count, but the subset is only a.txt).
    hits = store.search_line_embeddings(basis(2), ["a.txt", "a.txt"], top_k=10)
    assert all(h.path == "a.txt" for h in hits)
    hits0 = store.search_line_embeddings(basis(0), ["a.txt", "a.txt"], top_k=10)
    assert [h.line_number for h in hits0 if h.distance < 1e-6] == [0]


def test_int8_tier_large_topk_falls_through(tmp_path, monkeypatch):
    # 4*top_k above the Pallas k=64 selection limit must skip the int8
    # tier gracefully (f32 path routes to XLA), not blow up compilation.
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT8", "1")
    s = Store(str(tmp_path / "bigk"), dim=32)
    rng = np.random.default_rng(11)
    rows = rng.standard_normal((300, 32)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    s.upsert_document_lines("/big.txt", rows)
    got = s.search_line_embeddings(rows[7], ["/big.txt"], top_k=200)
    assert len(got) == 200
    assert (got[0].path, got[0].line_number) == ("/big.txt", 7)
    assert got[0].distance < 1e-5
    s.close()
