"""Multi-query batch serving: Q queries in O(1) dispatches.

Covers the whole batch stack — ``Store.search_line_embeddings_batched``
across every serving tier (f32 / int8 / reduced / IVF-PQ / mesh-sharded),
the search-layer batched entry points, and the CLI ``--queries-file``
surface — by checking per-query results are identical to Q single-query
calls (the correctness anchor; the single-query paths have their own
tier-equivalence suites).
"""

from __future__ import annotations

import numpy as np
import pytest

from semtools_tpu.store import device_cache
from semtools_tpu.store.store import Store


def _unit(rng, n, d=32):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(autouse=True)
def _clean_cache():
    device_cache.invalidate()
    yield
    device_cache.invalidate()


@pytest.fixture()
def filled(tmp_path):
    s = Store(str(tmp_path / "ws"), dim=32)
    rng = np.random.default_rng(7)
    docs = {}
    for name, n in [("/z.txt", 41), ("/a.txt", 41), ("/m.txt", 41)]:
        rows = _unit(rng, n)
        s.upsert_document_lines(name, rows)
        docs[name] = rows
    yield s, docs
    s.close()


def _assert_same_lists(batched, singles):
    assert len(batched) == len(singles)
    for b_rows, s_rows in zip(batched, singles):
        assert len(b_rows) == len(s_rows)
        for x, y in zip(b_rows, s_rows):
            assert (x.path, x.line_number) == (y.path, y.line_number)
            assert abs(x.distance - y.distance) < 1e-5


def _queries(docs, rng, extra=2):
    qs = [docs["/a.txt"][3], docs["/m.txt"][10], docs["/z.txt"][40]]
    qs += [_unit(rng, 1)[0] for _ in range(extra)]
    return np.stack(qs)


def _run_both(s, docs, qs, top_k, max_distance=None, paths=None):
    paths = list(docs) if paths is None else paths
    batched = s.search_line_embeddings_batched(qs, paths, top_k, max_distance)
    singles = [
        s.search_line_embeddings(q, paths, top_k, max_distance) for q in qs
    ]
    return batched, singles


def test_batched_matches_single_f32_topk_and_threshold(filled, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT8", "0")
    s, docs = filled
    qs = _queries(docs, np.random.default_rng(1))
    _assert_same_lists(*_run_both(s, docs, qs, top_k=4))
    _assert_same_lists(*_run_both(s, docs, qs, top_k=4, max_distance=0.6))
    # self-match hits land where planted
    batched, _ = _run_both(s, docs, qs, top_k=1)
    assert (batched[0][0].path, batched[0][0].line_number) == ("/a.txt", 3)
    assert (batched[2][0].path, batched[2][0].line_number) == ("/z.txt", 40)


def test_batched_matches_single_subset(filled, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    s, docs = filled
    qs = _queries(docs, np.random.default_rng(2))
    subset = ["/a.txt", "/m.txt"]
    batched, singles = _run_both(s, docs, qs, top_k=3, paths=subset)
    _assert_same_lists(batched, singles)
    assert all(r.path in subset for rows in batched for r in rows)
    _assert_same_lists(
        *_run_both(s, docs, qs, top_k=3, max_distance=0.5, paths=subset)
    )


def test_batched_matches_single_int8_tier(filled, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT8", "1")
    s, docs = filled
    qs = _queries(docs, np.random.default_rng(3))
    _assert_same_lists(*_run_both(s, docs, qs, top_k=3))
    _assert_same_lists(*_run_both(s, docs, qs, top_k=3, max_distance=0.6))


def test_batched_matches_single_reduced_tier(filled, monkeypatch):
    # Budget fits the int8-reduced corpus but not f32/int8 full-dim.
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    s, docs = filled
    # slot_rows * 32 dims > budget; * 8 dims fits
    monkeypatch.setenv(
        "SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(s._slot_rows(123) * 16)
    )
    monkeypatch.setenv("SEMTOOLS_TPU_REDUCED_DIM", "8")
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT4", "0")  # pin the reduced rung
    assert "reduced" in s.serving_tier()
    qs = _queries(docs, np.random.default_rng(4))
    _assert_same_lists(*_run_both(s, docs, qs, top_k=3))
    _assert_same_lists(*_run_both(s, docs, qs, top_k=3, max_distance=0.6))


def test_batched_matches_single_ann_tier(filled, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    monkeypatch.setenv("SEMTOOLS_TPU_FORCE_ANN", "1")
    s, docs = filled
    s.build_ann_index(force=True)
    assert s.serving_tier() == "ivf-pq"
    qs = _queries(docs, np.random.default_rng(5))
    _assert_same_lists(*_run_both(s, docs, qs, top_k=3))
    _assert_same_lists(*_run_both(s, docs, qs, top_k=3, max_distance=0.6))


def test_batched_matches_single_sharded(filled, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    s, docs = filled
    assert s.serving_tier().startswith("sharded-")
    qs = _queries(docs, np.random.default_rng(6))
    batched, _ = _run_both(s, docs, qs, top_k=3)
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    device_cache.invalidate()
    _, singles = _run_both(s, docs, qs, top_k=3)
    _assert_same_lists(batched, singles)

    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    device_cache.invalidate()
    batched_t, _ = _run_both(s, docs, qs, top_k=3, max_distance=0.6)
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    device_cache.invalidate()
    _, singles_t = _run_both(s, docs, qs, top_k=3, max_distance=0.6)
    _assert_same_lists(batched_t, singles_t)


def test_batched_mutation_then_search_stays_consistent(filled, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    s, docs = filled
    rng = np.random.default_rng(8)
    qs = _queries(docs, rng)
    _run_both(s, docs, qs, top_k=3)  # warm the slot cache
    new_rows = _unit(rng, 17)
    s.upsert_document_lines("/a.txt", new_rows)
    docs["/a.txt"] = new_rows
    _assert_same_lists(*_run_both(s, docs, qs, top_k=3))


def test_batched_empty_and_degenerate(filled):
    s, docs = filled
    qs = _unit(np.random.default_rng(9), 3)
    assert s.search_line_embeddings_batched(qs, [], 3) == [[], [], []]
    assert s.search_line_embeddings_batched(qs, list(docs), 0) == [[], [], []]
    assert s.search_line_embeddings_batched(
        np.zeros((0, 32), np.float32), list(docs), 3
    ) == []
    # 1-D query vector behaves like a batch of one
    one = s.search_line_embeddings_batched(qs[0], list(docs), 3)
    assert len(one) == 1 and len(one[0]) == 3


# -- search layer -------------------------------------------------------------


def test_search_files_batched_matches_single(tmp_path, fallback_model):
    from semtools_tpu.search import (
        SearchConfig,
        search_files,
        search_files_batched,
    )

    f1 = tmp_path / "a.txt"
    f1.write_text("the quick brown fox\nan essay about databases\nneural nets\n")
    f2 = tmp_path / "b.txt"
    f2.write_text("convolutional layers\ngraph databases scale\n")
    files = [str(f1), str(f2)]
    queries = ["databases", "fox jumping", "convolution"]
    config = SearchConfig(top_k=2, n_lines=1)
    per = search_files_batched(files, queries, fallback_model, config)
    assert len(per) == 3
    for q, got in zip(queries, per):
        want = search_files(files, q, fallback_model, config)
        assert [(r.filename, r.match_line) for r in got] == [
            (r.filename, r.match_line) for r in want
        ]
        np.testing.assert_allclose(
            [r.distance for r in got], [r.distance for r in want], atol=1e-5
        )
    assert per[0][0].lines  # context text attached

    t_config = SearchConfig(top_k=2, n_lines=0, max_distance=0.9)
    per_t = search_files_batched(files, queries, fallback_model, t_config)
    for q, got in zip(queries, per_t):
        want = search_files(files, q, fallback_model, t_config)
        assert [(r.filename, r.match_line) for r in got] == [
            (r.filename, r.match_line) for r in want
        ]


def test_search_files_batched_ignore_case(tmp_path, fallback_model):
    from semtools_tpu.search import SearchConfig, search_files_batched

    f = tmp_path / "a.txt"
    f.write_text("DATABASES ESSAY\nunrelated line\n")
    config = SearchConfig(top_k=1, ignore_case=True)
    per = search_files_batched([str(f)], ["databases essay"], fallback_model, config)
    assert per[0][0].match_line == 0
    assert per[0][0].lines[0] == "DATABASES ESSAY"  # original text reported


def test_zero_slots_cannot_crowd_compressed_candidates(tmp_path, monkeypatch):
    """Soak-found regression: freed (zeroed) slots score compressed sim 0
    and used to crowd real rows with ~0/negative compressed sims out of
    the fixed oversample window on fragmented stores. The candidate
    window must grow until it holds the intended number of REAL rows."""
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    monkeypatch.setenv("SEMTOOLS_TPU_REDUCED_DIM", "8")
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT4", "0")  # pin the reduced rung
    rng = np.random.default_rng(0)
    s = Store(str(tmp_path / "ws"), dim=16)

    # 200 junk rows -> deleted -> 200 zeroed slots
    s.upsert_document_lines("/junk.txt", _unit(rng, 200, 16))
    s.delete_line_embeddings(["/junk.txt"])

    # live corpus: variance lives in dims 0-7 (PCA keeps them)...
    live = np.zeros((49, 16), np.float32)
    live[:, :8] = rng.standard_normal((49, 8))
    live /= np.linalg.norm(live, axis=1, keepdims=True)
    # ...except the needle, which lives entirely in the DISCARDED dims:
    # its compressed sim is ~0, ranking at/below the 200 zero slots.
    needle = np.zeros(16, np.float32)
    needle[8:] = rng.standard_normal(8)
    needle /= np.linalg.norm(needle)
    s.upsert_document_lines("/live.txt", live)
    s.upsert_document_lines("/needle.txt", needle[None, :])

    # budget forces the reduced tier on this fragmented capacity:
    # slot_rows * 16 dims > budget, slot_rows * 8 fits
    monkeypatch.setenv(
        "SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(s._slot_rows(50) * 12)
    )
    assert "reduced" in s.serving_tier()
    got = s.search_line_embeddings(needle, ["/live.txt", "/needle.txt"], 1)
    assert (got[0].path, got[0].line_number) == ("/needle.txt", 0)
    assert got[0].distance < 1e-5
    got_t = s.search_line_embeddings(
        needle, ["/live.txt", "/needle.txt"], 3, max_distance=0.5
    )
    assert (got_t[0].path, got_t[0].line_number) == ("/needle.txt", 0)
    s.close()
