"""Degraded-link host serving: mmap-scored queries + the routing policy."""

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
    rng = np.random.default_rng(17)
    docs = {}
    for name, n in [("/z.txt", 41), ("/a.txt", 41), ("/m.txt", 41)]:
        rows = _unit(rng, n)
        s.upsert_document_lines(name, rows)
        docs[name] = rows
    yield s, docs
    s.close()


def _same(a, b):
    assert [(r.path, r.line_number) for r in a] == [
        (r.path, r.line_number) for r in b
    ]
    for x, y in zip(a, b):
        assert abs(x.distance - y.distance) < 1e-5


def test_host_scan_matches_device_all_modes(filled, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    s, docs = filled
    rng = np.random.default_rng(1)
    qs = np.stack([docs["/a.txt"][3], _unit(rng, 1)[0]])

    monkeypatch.setenv("SEMTOOLS_TPU_SCAN", "device")
    dev_topk = [s.search_line_embeddings(q, list(docs), 4) for q in qs]
    dev_thr = [s.search_line_embeddings(q, list(docs), 4, 0.6) for q in qs]
    dev_sub = [s.search_line_embeddings(q, ["/a.txt", "/m.txt"], 3) for q in qs]

    monkeypatch.setenv("SEMTOOLS_TPU_SCAN", "host")
    device_cache.invalidate()
    for r, q in enumerate(qs):
        _same(s.search_line_embeddings(q, list(docs), 4), dev_topk[r])
        _same(s.search_line_embeddings(q, list(docs), 4, 0.6), dev_thr[r])
        _same(s.search_line_embeddings(q, ["/a.txt", "/m.txt"], 3), dev_sub[r])
    # batched through the host path too
    per = s.search_line_embeddings_batched(qs, list(docs), 4)
    for r in range(2):
        _same(per[r], dev_topk[r])
    per_t = s.search_line_embeddings_batched(qs, list(docs), 4, 0.6)
    for r in range(2):
        _same(per_t[r], dev_thr[r])


def test_host_scan_chunked_merge(filled, monkeypatch):
    # force multiple chunks so the per-block candidate merge is exercised
    s, docs = filled
    monkeypatch.setenv("SEMTOOLS_TPU_SCAN", "host")
    monkeypatch.setattr(Store, "_HOST_SCAN_CHUNK", 32)
    rng = np.random.default_rng(2)
    q = _unit(rng, 1)[0]
    monkeypatch.setenv("SEMTOOLS_TPU_SCAN", "device")
    want = s.search_line_embeddings(q, list(docs), 5)
    monkeypatch.setenv("SEMTOOLS_TPU_SCAN", "host")
    got = s.search_line_embeddings(q, list(docs), 5)
    _same(got, want)


def test_prefer_host_scan_policy(filled, monkeypatch):
    s, _ = filled
    import semtools_tpu.ops.host_embed as he

    monkeypatch.setenv("SEMTOOLS_TPU_SCAN", "host")
    assert s._prefer_host_scan(100, 128, warm=True) is True
    monkeypatch.setenv("SEMTOOLS_TPU_SCAN", "device")
    assert s._prefer_host_scan(10**8, 1024, warm=False) is False

    monkeypatch.setenv("SEMTOOLS_TPU_SCAN", "auto")
    # a warm device cache always serves
    assert s._prefer_host_scan(10**8, 1024, warm=True) is False
    # degraded link + cold cache -> host
    monkeypatch.setattr(
        he, "_link_bandwidth", lambda: {"t": 0, "up_Bps": 1e5, "down_Bps": 1e5}
    )
    assert s._prefer_host_scan(1_000_000, 128, warm=False) is True
    # healthy link -> device even when cold
    monkeypatch.setattr(
        he, "_link_bandwidth", lambda: {"t": 0, "up_Bps": 1e10, "down_Bps": 1e10}
    )
    assert s._prefer_host_scan(1_000_000, 128, warm=False) is False
    # no device at all -> host
    monkeypatch.setattr(he, "_link_bandwidth", lambda: None)
    assert s._prefer_host_scan(1_000_000, 128, warm=False) is True


def test_host_scan_after_mutation(filled, monkeypatch):
    s, docs = filled
    monkeypatch.setenv("SEMTOOLS_TPU_SCAN", "host")
    rng = np.random.default_rng(3)
    new_rows = _unit(rng, 17)
    s.upsert_document_lines("/a.txt", new_rows)
    docs["/a.txt"] = new_rows
    q = new_rows[5]
    got = s.search_line_embeddings(q, list(docs), 1)
    assert (got[0].path, got[0].line_number) == ("/a.txt", 5)
    assert got[0].distance < 1e-5


def test_serving_tier_reports_forced_host_mode(filled, monkeypatch):
    s, _ = filled
    monkeypatch.setenv("SEMTOOLS_TPU_SCAN", "host")
    assert s.serving_tier() == "host-mmap-scan"
    monkeypatch.delenv("SEMTOOLS_TPU_SCAN")
    assert s.serving_tier() != "host-mmap-scan"


def test_forced_host_outranks_ann_tier(filled, monkeypatch):
    """SEMTOOLS_TPU_SCAN=host must serve the exact mmap scan even when a
    fresh ANN index would otherwise take the query (review regression)."""
    s, docs = filled
    monkeypatch.setenv("SEMTOOLS_TPU_FORCE_ANN", "1")
    s.build_ann_index(force=True)
    q = docs["/m.txt"][7]

    monkeypatch.setenv("SEMTOOLS_TPU_SCAN", "host")
    assert s.serving_tier() == "host-mmap-scan"

    def _boom(*a, **kw):
        raise AssertionError("ANN tier must not serve under forced host mode")

    monkeypatch.setattr(Store, "_search_ann_batched", _boom)
    got = s.search_line_embeddings(q, list(docs), 3)
    assert (got[0].path, got[0].line_number) == ("/m.txt", 7)
    got_b = s.search_line_embeddings_batched(q[None], list(docs), 3)
    assert (got_b[0][0].path, got_b[0][0].line_number) == ("/m.txt", 7)
