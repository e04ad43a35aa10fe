"""Device corpus cache: LRU semantics + store integration freshness."""

from __future__ import annotations

import numpy as np
import pytest

from semtools_tpu.store import device_cache
from semtools_tpu.store.store import Store


@pytest.fixture(autouse=True)
def clean_cache():
    device_cache.invalidate()
    yield
    device_cache.invalidate()


def test_get_or_put_caches():
    calls = []

    def build():
        calls.append(1)
        return np.zeros((4, 4), np.float32)

    a = device_cache.get_or_put(("k", 1), build)
    b = device_cache.get_or_put(("k", 1), build)
    assert a is b and len(calls) == 1


def test_lru_eviction(monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(3 * 64))
    for i in range(5):
        device_cache.get_or_put(("k", i), lambda: np.zeros(16, np.float32))  # 64 B
    n, total = device_cache.stats()
    assert n <= 3 and total <= 3 * 64
    # oldest keys evicted
    calls = []
    device_cache.get_or_put(("k", 0), lambda: (calls.append(1), np.zeros(16, np.float32))[1])
    assert calls == [1]


def test_oversized_entry_not_cached(monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", "8")
    out = device_cache.get_or_put(("big", 0), lambda: np.zeros(100, np.float32))
    assert out.shape == (100,)
    assert device_cache.stats()[0] == 0


def test_store_full_scan_uses_cache_and_respects_generation(tmp_path):
    s = Store(str(tmp_path / "ws"), dim=16)
    rng = np.random.default_rng(0)
    rows = rng.standard_normal((20, 16)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    s.upsert_document_lines("/a.txt", rows)

    q = rows[3]
    got1 = s.search_line_embeddings(q, ["/a.txt"], top_k=1)
    assert got1[0].line_number == 3
    n1, _ = device_cache.stats()
    assert n1 == 1

    # same generation -> cache hit (entry count unchanged)
    s.search_line_embeddings(q, ["/a.txt"], top_k=1)
    assert device_cache.stats()[0] == 1

    # mutation bumps generation -> the entry is PATCHED in place (still
    # one entry), and fresh data is served
    rows2 = rows.copy()
    rows2[5] = rows[3]
    s.upsert_document_lines("/a.txt", rows2)
    got2 = s.search_line_embeddings(q, ["/a.txt"], top_k=2)
    assert {rl.line_number for rl in got2} == {3, 5}
    assert device_cache.stats()[0] == 1
    s.close()


def test_nbytes_counts_tuple_entries(monkeypatch):
    # store entries are (array, n_true) tuples; byte accounting must see them
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(2 * 64))
    for i in range(4):
        device_cache.get_or_put(("t", i), lambda: (np.zeros(16, np.float32), 16))
    n, total = device_cache.stats()
    assert n <= 2 and total <= 2 * 64


def test_int8_tier_env_gated(tmp_path, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT8", "1")
    s = Store(str(tmp_path / "wsq"), dim=32)
    rng = np.random.default_rng(7)
    rows = rng.standard_normal((40, 32)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    s.upsert_document_lines("/q.txt", rows)
    q = rows[11]
    got = s.search_line_embeddings(q, ["/q.txt"], top_k=3)
    assert got[0].line_number == 11
    assert got[0].distance < 1e-5  # exact rerank reports f32 distances
    # entries: one int8-keyed cache entry
    keys_hit, _ = device_cache.stats()
    assert keys_hit >= 1
    # threshold mode bypasses the int8 tier (uses exact path)
    got_t = s.search_line_embeddings(q, ["/q.txt"], top_k=5, max_distance=0.5)
    assert any(rl.line_number == 11 for rl in got_t)
    s.close()


def test_int8_tier_multi_doc_slot_mapping(tmp_path, monkeypatch):
    # Regression: docs upserted in non-alphabetical path order produce
    # slot-ordered != path-ordered ranges; the int8 tier must map scan
    # rows back through SLOT order or it returns wrong paths/lines.
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT8", "1")
    s = Store(str(tmp_path / "wsm"), dim=32)
    rng = np.random.default_rng(8)
    rows_b = rng.standard_normal((40, 32)).astype(np.float32)
    rows_b /= np.linalg.norm(rows_b, axis=1, keepdims=True)
    rows_a = rng.standard_normal((40, 32)).astype(np.float32)
    rows_a /= np.linalg.norm(rows_a, axis=1, keepdims=True)
    s.upsert_document_lines("/b.txt", rows_b)  # slots 0-39
    s.upsert_document_lines("/a.txt", rows_a)  # slots 40-79

    q = rows_a[11]
    got = s.search_line_embeddings(q, ["/a.txt", "/b.txt"], top_k=1)
    assert (got[0].path, got[0].line_number) == ("/a.txt", 11)
    assert got[0].distance < 1e-5

    # result also matches the exact tier
    monkeypatch.delenv("SEMTOOLS_TPU_STORE_INT8")
    device_cache.invalidate()
    exact = s.search_line_embeddings(q, ["/a.txt", "/b.txt"], top_k=1)
    assert (exact[0].path, exact[0].line_number) == ("/a.txt", 11)
    s.close()


def test_full_store_cache_order_independent(tmp_path):
    # The (dir, generation) cache key assumes a canonical gather order;
    # two full-store queries with different caller path orders must agree.
    s = Store(str(tmp_path / "wso"), dim=16)
    rng = np.random.default_rng(9)
    for name in ("/z.txt", "/m.txt", "/a.txt"):
        rows = rng.standard_normal((10, 16)).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        s.upsert_document_lines(name, rows)
    q = np.asarray(s._mmap("r")[13])  # some stored row
    r1 = s.search_line_embeddings(q, ["/z.txt", "/m.txt", "/a.txt"], top_k=1)
    r2 = s.search_line_embeddings(q, ["/a.txt", "/z.txt", "/m.txt"], top_k=1)
    assert (r1[0].path, r1[0].line_number) == (r2[0].path, r2[0].line_number)
    assert r1[0].distance < 1e-5
    s.close()
