"""Reduced-32d capacity rung: when the configured reduced dim (default
64) does not fit the device budget, the policy halves down to 32 before
surrendering to the host IVF-PQ tier — doubling single-chip device
serving capacity (~67M -> ~134M rows at D=256) with exact re-ranked
distances and a margin-certified pool.

Also covers the hard completion-margin mode
(SEMTOOLS_TPU_TOPK_MARGIN_SIGMAS=hard): the unconditional worst-case
bound must serve the same exact results as the default 6-sigma margin.

Reference contract: qdrant-edge serves ANN at any corpus size
(/root/reference/src/workspace/store.rs:443); this build's ladder keeps
the corpus on-device as long as any rung fits.
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
def rung_env(monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    monkeypatch.delenv("SEMTOOLS_TPU_REDUCED_DIM", raising=False)
    monkeypatch.delenv("SEMTOOLS_TPU_STORE_INT4", raising=False)
    monkeypatch.delenv("SEMTOOLS_TPU_TOPK_MARGIN_SIGMAS", raising=False)


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _mk(tmp_path, n=64, dim=256, seed=3):
    s = Store(str(tmp_path / "ws"), dim=dim)
    rows = _unit(np.random.default_rng(seed), n, dim)
    s.upsert_document_lines("/a.txt", rows)
    return s, rows


def test_reduced_dim_halves_to_32(tmp_path, monkeypatch):
    """Budget ladder at D=256 (bytes/slot-row): int8 256, int4 128,
    reduced-64d 64, reduced-32d 32. Each budget band must pick its rung;
    the 33-63 B/row band is the NEW one (previously fell off to ANN)."""
    s, _ = _mk(tmp_path)
    n = 64
    slot_rows = s._slot_rows(n)

    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(slot_rows * 70))
    assert s._capacity_reduced_dim(n) == 64
    assert s.serving_tier(n) == "int8-mxu-scan-reduced64d"

    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(slot_rows * 48))
    assert s._capacity_reduced_dim(n) == 32
    assert s.serving_tier(n) == "int8-mxu-scan-reduced32d"
    assert not s._use_ann_tier(n)

    # below the 32d rung nothing fits: ANN takes over (given min-rows)
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(slot_rows * 20))
    monkeypatch.setenv("SEMTOOLS_TPU_ANN_MIN_ROWS", "1")
    assert s._capacity_reduced_dim(n) is None
    assert s._use_ann_tier(n)
    s.close()


def test_explicit_sub32_rung_honored_but_not_halved(tmp_path, monkeypatch):
    """An explicit SEMTOOLS_TPU_REDUCED_DIM below 32 is served as-is
    (tests and exotic deployments pin tiny rungs), but auto-halving
    never goes below 32 on its own."""
    s, _ = _mk(tmp_path)
    n = 64
    slot_rows = s._slot_rows(n)
    monkeypatch.setenv("SEMTOOLS_TPU_REDUCED_DIM", "8")
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(slot_rows * 12))
    assert s._capacity_reduced_dim(n) == 8
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(slot_rows * 4))
    assert s._capacity_reduced_dim(n) is None
    # default config: 33-63 B/row resolves to 32, never 16
    monkeypatch.delenv("SEMTOOLS_TPU_REDUCED_DIM")
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(slot_rows * 33))
    assert s._capacity_reduced_dim(n) == 32
    s.close()


def test_reduced32_serves_exact_results(tmp_path, monkeypatch):
    """End-to-end through the auto-halved 32d rung: top-k equals the
    exact scan with f32-exact distances (margin completion grows the
    pool until the certificate holds)."""
    s, rows = _mk(tmp_path, n=300, seed=11)
    n = 300
    slot_rows = s._slot_rows(n)
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(slot_rows * 48))
    assert s.serving_tier(n).endswith("reduced32d")
    q = rows[123]
    got = s.search_line_embeddings(q, ["/a.txt"], top_k=10)
    exact = 1.0 - rows @ q
    order = np.argsort(exact, kind="stable")[:10]
    assert [rl.line_number for rl in got] == list(order)
    for rl, o in zip(got, order):
        np.testing.assert_allclose(rl.distance, exact[o], atol=1e-5)
    s.close()


@pytest.mark.parametrize("bytes_per_row", [48, 300])
def test_hard_margin_mode_matches_default(tmp_path, monkeypatch,
                                          bytes_per_row):
    """SEMTOOLS_TPU_TOPK_MARGIN_SIGMAS=hard widens the completion margin
    to the unconditional worst case; served results must be identical to
    the default statistical margin (both re-rank exactly), on both the
    reduced-32d rung (48 B/row) and the full-dim int8 tier (300)."""
    s, rows = _mk(tmp_path, n=200, seed=7)
    n = 200
    slot_rows = s._slot_rows(n)
    monkeypatch.setenv(
        "SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(slot_rows * bytes_per_row)
    )
    q = rows[50]
    base = s.search_line_embeddings(q, ["/a.txt"], top_k=7)
    device_cache.invalidate()
    monkeypatch.setenv("SEMTOOLS_TPU_TOPK_MARGIN_SIGMAS", "hard")
    hard = s.search_line_embeddings(q, ["/a.txt"], top_k=7)
    assert [rl.line_number for rl in hard] == [rl.line_number for rl in base]
    for a, b in zip(hard, base):
        np.testing.assert_allclose(a.distance, b.distance, atol=1e-6)
    exact = 1.0 - rows @ q
    order = np.argsort(exact, kind="stable")[:7]
    assert [rl.line_number for rl in hard] == list(order)
    s.close()
