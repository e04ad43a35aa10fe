"""Int4 serving tier: store integration (policy, serving, patching,
subsets, thresholds, sharded mesh) — every served distance must be
f32-exact and every result must match the exact tier.

Reference contract: qdrant-edge's compressed ANN serving with exact
reported scores (src/workspace/store.rs); this tier is the capacity rung
between the full int8 scan and the reduced-64d projection.
"""

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


@pytest.fixture(autouse=True)
def int4_env(monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT4", "1")
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_int4_tier_serves_exact_results(tmp_path):
    s = Store(str(tmp_path / "ws"), dim=32)
    rng = np.random.default_rng(1)
    rows = _unit(rng, 60, 32)
    s.upsert_document_lines("/a.txt", rows)
    assert s.serving_tier() == "int4-mxu-scan"
    q = rows[17]
    got = s.search_line_embeddings(q, ["/a.txt"], top_k=3)
    assert got[0].line_number == 17
    assert got[0].distance < 1e-5  # exact re-rank reports f32 distances
    # full ranking matches the exact scan
    exact = 1.0 - rows @ q
    order = np.argsort(exact, kind="stable")[:3]
    assert [rl.line_number for rl in got] == list(order)
    for rl, o in zip(got, order):
        np.testing.assert_allclose(rl.distance, exact[o], atol=1e-5)
    s.close()


def test_int4_tier_multi_doc_and_threshold(tmp_path):
    s = Store(str(tmp_path / "wsm"), dim=32)
    rng = np.random.default_rng(2)
    rows_b = _unit(rng, 40, 32)
    rows_a = _unit(rng, 40, 32)
    s.upsert_document_lines("/b.txt", rows_b)
    s.upsert_document_lines("/a.txt", rows_a)
    q = rows_a[11]
    got = s.search_line_embeddings(q, ["/a.txt", "/b.txt"], top_k=1)
    assert (got[0].path, got[0].line_number) == ("/a.txt", 11)
    assert got[0].distance < 1e-5
    # threshold mode: strict filter over exact distances
    got_t = s.search_line_embeddings(
        q, ["/a.txt", "/b.txt"], top_k=5, max_distance=0.5
    )
    assert any(
        rl.path == "/a.txt" and rl.line_number == 11 for rl in got_t
    )
    assert all(rl.distance < 0.5 for rl in got_t)
    s.close()


def test_int4_tier_patching_serves_fresh_rows(tmp_path):
    """A mutation must be served from the patched packed corpus (one
    cache entry throughout), and freed slots must not surface."""
    s = Store(str(tmp_path / "wsp"), dim=32)
    rng = np.random.default_rng(3)
    rows = _unit(rng, 50, 32)
    s.upsert_document_lines("/a.txt", rows)
    q = rows[3]
    got1 = s.search_line_embeddings(q, ["/a.txt"], top_k=1)
    assert got1[0].line_number == 3
    assert device_cache.stats()[0] == 1

    rows2 = rows.copy()
    rows2[5] = rows[3]
    s.upsert_document_lines("/a.txt", rows2)
    got2 = s.search_line_embeddings(q, ["/a.txt"], top_k=2)
    assert {rl.line_number for rl in got2} == {3, 5}
    assert device_cache.stats()[0] == 1  # patched in place
    s.close()


def test_int4_tier_delete_frees_slots_without_stale_hits(tmp_path):
    s = Store(str(tmp_path / "wsd"), dim=32)
    rng = np.random.default_rng(4)
    rows_a = _unit(rng, 30, 32)
    rows_b = _unit(rng, 30, 32)
    s.upsert_document_lines("/a.txt", rows_a)
    s.upsert_document_lines("/b.txt", rows_b)
    q = rows_a[7]
    got = s.search_line_embeddings(q, ["/a.txt", "/b.txt"], top_k=1)
    assert got[0].path == "/a.txt"
    s.delete_documents(["/a.txt"])
    got2 = s.search_line_embeddings(q, ["/b.txt"], top_k=3)
    assert got2 and all(rl.path == "/b.txt" for rl in got2)
    # exact parity after the deletion (freed slots are packed-zero rows)
    exact = 1.0 - rows_b @ q
    order = np.argsort(exact, kind="stable")[:3]
    assert [rl.line_number for rl in got2] == list(order)
    s.close()


def test_int4_tier_subset_mask(tmp_path):
    """Path-subset queries ride the warm packed corpus with a slot mask."""
    s = Store(str(tmp_path / "wss"), dim=32)
    rng = np.random.default_rng(5)
    rows_a = _unit(rng, 40, 32)
    rows_b = _unit(rng, 40, 32)
    s.upsert_document_lines("/a.txt", rows_a)
    s.upsert_document_lines("/b.txt", rows_b)
    q = rows_b[9]
    # warm the whole-store corpus first
    s.search_line_embeddings(q, ["/a.txt", "/b.txt"], top_k=1)
    got = s.search_line_embeddings(q, ["/a.txt"], top_k=3)
    assert got and all(rl.path == "/a.txt" for rl in got)
    exact = 1.0 - rows_a @ q
    order = np.argsort(exact, kind="stable")[:3]
    assert [rl.line_number for rl in got] == list(order)
    s.close()


def test_int4_capacity_rung(tmp_path, monkeypatch):
    """When int8 blows the device budget but the packed corpus fits, the
    store must pick int4 (the capacity ladder's middle rung) without any
    force flag."""
    monkeypatch.delenv("SEMTOOLS_TPU_STORE_INT4", raising=False)
    s = Store(str(tmp_path / "wsc"), dim=32)
    rng = np.random.default_rng(6)
    rows = _unit(rng, 100, 32)
    s.upsert_document_lines("/a.txt", rows)
    n = 100
    # budget: int8 needs n*32 B; int4 needs n*16 B. Pick between.
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(n * 24))
    assert s._device_kind(n) == ("int4", None)
    assert s.serving_tier(n) == "int4-mxu-scan"
    # below the int4 floor the reduced tier takes over
    monkeypatch.setenv("SEMTOOLS_TPU_REDUCED_DIM", "8")
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(n * 12))
    kind, rd = s._device_kind(n)
    assert (kind, rd) == ("int8", 8)
    # int4 disabled: skip the rung entirely
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(n * 24))
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT4", "0")
    kind, rd = s._device_kind(n)
    assert (kind, rd) == ("int8", 8)
    s.close()


def test_int4_tier_sharded(tmp_path, monkeypatch):
    """Mesh-sharded int4 serving on the virtual device mesh must match
    the exact scan (value check, not just smoke)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device (virtual) mesh")
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    s = Store(str(tmp_path / "wsh"), dim=32)
    rng = np.random.default_rng(7)
    rows = _unit(rng, 200, 32)
    s.upsert_document_lines("/a.txt", rows)
    assert s.serving_tier().startswith("sharded-int4-scan[")
    q = rows[42]
    got = s.search_line_embeddings(q, ["/a.txt"], top_k=5)
    exact = 1.0 - rows @ q
    order = np.argsort(exact, kind="stable")[:5]
    assert [rl.line_number for rl in got] == list(order)
    for rl, o in zip(got, order):
        np.testing.assert_allclose(rl.distance, exact[o], atol=1e-5)
    s.close()


def test_int4_rung_outranks_ann_tier(tmp_path, monkeypatch):
    """A corpus whose int8 image is over budget but whose packed image
    fits must serve on-device int4 — NOT IVF-PQ, even with a fresh ANN
    index on disk. Regression: _use_ann_tier inferred "nothing fits"
    from _capacity_reduced_dim's None, which is also what int4-fits
    returns, so an int4-sized store with an index demoted itself to the
    host ANN tier (found by the capacity-ladder policy sweep)."""
    monkeypatch.delenv("SEMTOOLS_TPU_STORE_INT4", raising=False)
    s = Store(str(tmp_path / "wsa"), dim=32)
    rng = np.random.default_rng(9)
    rows = _unit(rng, 400, 32)
    s.upsert_document_lines("/a.txt", rows)
    n = 400
    monkeypatch.setenv("SEMTOOLS_TPU_ANN_MIN_ROWS", "100")
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(n * 24))
    s.build_ann_index(force=True)
    assert not s._use_ann_tier(n)
    assert s.serving_tier(n) == "int4-mxu-scan"
    got = s.search_line_embeddings(rows[7], ["/a.txt"], top_k=3)
    assert got[0].line_number == 7 and got[0].distance < 1e-5
    # once even the packed + reduced images blow the budget, ANN engages
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(n * 2))
    assert s._use_ann_tier(n)
    s.close()
