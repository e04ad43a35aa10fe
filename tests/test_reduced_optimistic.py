"""Reduced-tier optimistic-bound serving: the residual-norm column.

Regression for the r5 capacity-ladder finding: a clustered corpus with
MORE cluster directions than the projection dim puts cluster structure
into the residual, so residual alignment with in-cluster queries is
systematic (~1, not ~1/sqrt(D-rd)) and the r4 statistical margin
certified incomplete pools (measured recall 0.81-0.84 at 932k rows /
186 clusters / rd=64). The redesign stores each row's ceil-quantized
residual norm as an extra corpus column and scores the query augmented
with q_perp — the same MXU matmul then selects by a per-row HARD lower
bound on the exact distance, making completion certificates
unconditional in the residual component.

Reference contract: qdrant-edge serves its ANN index with exact reported
scores at any corpus size (/root/reference/src/workspace/store.rs:443).
"""

from __future__ import annotations

import numpy as np
import pytest

from semtools_tpu.store import device_cache, patch_cache
from semtools_tpu.store.store import Store


@pytest.fixture(autouse=True)
def clean_cache():
    device_cache.invalidate()
    yield
    device_cache.invalidate()


@pytest.fixture(autouse=True)
def rung_env(monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    monkeypatch.delenv("SEMTOOLS_TPU_TOPK_MARGIN_SIGMAS", raising=False)


def _clustered(rng, n, d, n_clusters, noise=0.15):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    cid = rng.integers(0, n_clusters, n)
    x = centers[cid] + noise * rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def test_clustered_corpus_beyond_rd_recall_exact(tmp_path, monkeypatch):
    """Clusters (64) >> rd (16): the regime where the r4 statistical
    margin lost ~2 of 10 true hits per query. Every query's top-10 must
    equal brute force, with exact distances."""
    rng = np.random.default_rng(42)
    d, n = 64, 24000
    rows = _clustered(rng, n, d, 64)
    s = Store(str(tmp_path / "ws"), dim=d)
    per_doc = n // 8
    paths = []
    for i in range(8):
        p = f"/doc{i}.txt"
        s.upsert_document_lines(p, rows[i * per_doc : (i + 1) * per_doc])
        paths.append(p)
    monkeypatch.setenv("SEMTOOLS_TPU_REDUCED_DIM", "16")
    monkeypatch.setenv(
        "SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(s._slot_rows(n) * 24)
    )
    assert s.serving_tier(n).endswith("reduced16d")
    # in-cluster queries: perturbed corpus rows (large q_perp regime)
    qi = rng.integers(0, n, 16)
    qs = rows[qi] + 0.05 * rng.standard_normal((16, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    res = s.search_line_embeddings_batched(qs, paths, top_k=10)
    exact = 1.0 - rows @ qs.T  # [n, Q]
    for r in range(16):
        order = np.argsort(exact[:, r], kind="stable")[:10]
        got = [
            int(rl.path[4:-4]) * per_doc + rl.line_number for rl in res[r]
        ]
        assert got == list(order), f"query {r}: recall break"
        np.testing.assert_allclose(
            [rl.distance for rl in res[r]], exact[order, r], atol=1e-5
        )
    s.close()


def test_residual_column_is_upper_bound_and_serving_survives_patch(
    tmp_path, monkeypatch
):
    """(1) The stored residual column times resid_scale upper-bounds
    every live row's true projection residual. (2) Upserting rows whose
    residual overflows the column's ceiling (127*resid_scale) must NOT
    serve through a stale bound — the patch bails to a rebuild that
    refits, and results stay brute-force exact."""
    rng = np.random.default_rng(3)
    d, n = 32, 600
    # base data in a low-dim subspace + small noise: residuals tiny
    basis = rng.standard_normal((4, d)).astype(np.float32)
    coef = rng.standard_normal((n, 4)).astype(np.float32)
    rows = coef @ basis + 0.01 * rng.standard_normal((n, d)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    s = Store(str(tmp_path / "ws"), dim=d)
    s.upsert_document_lines("/a.txt", rows)
    monkeypatch.setenv("SEMTOOLS_TPU_REDUCED_DIM", "8")
    monkeypatch.setenv(
        "SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(s._slot_rows(n) * 12)
    )
    assert s.serving_tier().endswith("reduced8d")
    s.search_line_embeddings(rows[0], ["/a.txt"], top_k=3)  # warm the entry

    sc = patch_cache.get(s, "int8", 8)
    assert sc is not None and sc.resid_scale is not None
    proj = rows @ sc.rotation
    r = np.sqrt(np.maximum(
        np.einsum("ij,ij->i", rows, rows)
        - np.einsum("ij,ij->i", proj, proj), 0.0))
    col = np.asarray(sc.corpus)[:n, 8].astype(np.float64) * sc.resid_scale
    assert np.all(col >= r - 1e-6)

    # rows nearly orthogonal to the fitted subspace: residual ~1, far
    # beyond the headroom fitted on ~0.01-residual data
    ortho = rng.standard_normal((40, d)).astype(np.float32)
    ortho -= (ortho @ np.linalg.pinv(basis)) @ basis
    ortho = ortho.astype(np.float32)
    ortho /= np.linalg.norm(ortho, axis=1, keepdims=True)
    s.upsert_document_lines("/b.txt", ortho)

    all_rows = np.concatenate([rows, ortho])
    q = ortho[7]
    got = s.search_line_embeddings(q, ["/a.txt", "/b.txt"], top_k=5)
    exact = 1.0 - all_rows @ q
    order = np.argsort(exact, kind="stable")[:5]
    want = [("/b.txt", int(o - n)) if o >= n else ("/a.txt", int(o))
            for o in order]
    assert [(rl.path, rl.line_number) for rl in got] == want
    for rl, o in zip(got, order):
        np.testing.assert_allclose(rl.distance, exact[o], atol=1e-5)
    s.close()


def test_threshold_mode_complete_on_clustered_reduced(tmp_path, monkeypatch):
    """Threshold mode through the optimistic-bound scan: every
    within-threshold row must be returned (the certificate now needs no
    residual alignment statistics)."""
    rng = np.random.default_rng(9)
    d, n = 64, 6000
    rows = _clustered(rng, n, d, 48)
    s = Store(str(tmp_path / "ws"), dim=d)
    s.upsert_document_lines("/a.txt", rows)
    monkeypatch.setenv("SEMTOOLS_TPU_REDUCED_DIM", "16")
    monkeypatch.setenv(
        "SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(s._slot_rows(n) * 24)
    )
    q = rows[100] + 0.03 * rng.standard_normal(d).astype(np.float32)
    q /= np.linalg.norm(q)
    exact = 1.0 - rows @ q
    thr = float(np.sort(exact)[25])  # a cut inside the neighbor shell
    got = s.search_line_embeddings(q, ["/a.txt"], top_k=1000,
                                   max_distance=thr)
    want = np.nonzero(exact < thr)[0]
    assert sorted(rl.line_number for rl in got) == sorted(want.tolist())
    s.close()
