"""Adversarial threshold-boundary property test for the quantized tiers.

Reference semantics (store.rs:495-543 + src/search/mod.rs:113-119 as
served by the workspace): a threshold search returns the top_k nearest
rows whose EXACT distance is strictly below max_distance. The compressed
device tiers (int8 / int4 / reduced) select candidates by quantized
similarity and re-rank exactly, so the danger zone is a corpus whose
rows cluster exactly astride the threshold at the tier's sim-error
scale: a within-threshold row that the quantized ordering ranks below
the candidate window would silently vanish.

This test plants hit shells at max_distance ± eps for eps around and
BELOW the int8/int4 sim error, across fragmentation states (freed
slots), and asserts every tier serves exactly the f32-exact result set.
"""

from __future__ import annotations

import numpy as np
import pytest

from semtools_tpu.store import device_cache
from semtools_tpu.store.store import Store

DIM = 64
THRESH = 0.3


@pytest.fixture(autouse=True)
def clean_cache():
    device_cache.invalidate()
    yield
    device_cache.invalidate()


def _boundary_corpus(rng, eps_list, per_shell):
    """(query, rows): rows at exact distance THRESH + eps for each eps,
    `per_shell` rows per shell, plus 50 background rows well outside."""
    q = rng.standard_normal(DIM).astype(np.float32)
    q /= np.linalg.norm(q)
    rows = []
    for eps in eps_list:
        a = 1.0 - (THRESH + eps)  # target cosine similarity
        for _ in range(per_shell):
            o = rng.standard_normal(DIM).astype(np.float32)
            o -= (o @ q) * q
            o /= np.linalg.norm(o)
            rows.append(a * q + np.sqrt(max(1.0 - a * a, 0.0)) * o)
    for _ in range(50):
        o = rng.standard_normal(DIM).astype(np.float32)
        o -= (o @ q) * q
        o /= np.linalg.norm(o)
        rows.append(0.2 * q + np.sqrt(1 - 0.04) * o)  # distance 0.8
    rows = np.stack(rows).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    return q, rows


EPS = [-2e-2, -1e-2, -1e-3, -1e-4, 1e-4, 1e-3, 1e-2, 2e-2]


def _exact_hits(q, rows, top_k):
    d = 1.0 - rows @ q
    order = np.argsort(d, kind="stable")[:top_k]
    order = order[d[order] < THRESH]
    return [(int(i), float(d[i])) for i in order]


def _fill(tmp_path, rng, fragmented: bool, per_shell: int = 12):
    s = Store(str(tmp_path / "ws"), dim=DIM)
    q, rows = _boundary_corpus(rng, EPS, per_shell=per_shell)
    if fragmented:
        junk = rng.standard_normal((120, DIM)).astype(np.float32)
        junk /= np.linalg.norm(junk, axis=1, keepdims=True)
        s.upsert_document_lines("/junk.txt", junk)
    s.upsert_document_lines("/a.txt", rows)
    if fragmented:
        s.delete_documents(["/junk.txt"])  # 120 freed slots ahead of /a
    return s, q, rows


TIERS = [
    ("int8", {"SEMTOOLS_TPU_STORE_INT8": "1"}),
    ("int4", {"SEMTOOLS_TPU_STORE_INT4": "1"}),
    ("reduced", {"SEMTOOLS_TPU_STORE_INT8": "1",
                 "SEMTOOLS_TPU_REDUCED_DIM": "16",
                 "SEMTOOLS_TPU_STORE_INT4": "0",
                 "SEMTOOLS_TPU_DEVICE_CACHE_BYTES": "small"}),
]


@pytest.mark.parametrize("fragmented", [False, True])
@pytest.mark.parametrize("tier,env", TIERS, ids=[t[0] for t in TIERS])
@pytest.mark.parametrize("top_k", [5, 40])
def test_threshold_boundary_matches_exact(tmp_path, monkeypatch, tier, env,
                                          fragmented, top_k):
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    rng = np.random.default_rng(hash((tier, fragmented, top_k)) % 2**32)
    s, q, rows = _fill(tmp_path, rng, fragmented)
    n = s.count_line_embeddings()
    for k, v in env.items():
        if v == "small":
            # force the reduced capacity rung at this corpus size
            v = str(s._slot_rows(n) * 32)
        monkeypatch.setenv(k, v)
    if tier == "reduced":
        kind, rd = s._device_kind(n)
        assert (kind, rd) == ("int8", 16)

    want = _exact_hits(q, rows, top_k)
    got = s.search_line_embeddings(q, ["/a.txt"], top_k=top_k,
                                   max_distance=THRESH)
    got_pairs = [(rl.line_number, rl.distance) for rl in got]
    assert [p[0] for p in got_pairs] == [p[0] for p in want], (
        f"{tier} fragmented={fragmented} top_k={top_k}: hit set diverged\n"
        f"got  {got_pairs}\nwant {want}"
    )
    for (gi, gd), (wi, wd) in zip(got_pairs, want):
        assert abs(gd - wd) < 1e-5
    s.close()


@pytest.mark.parametrize("tier,env", TIERS, ids=[t[0] for t in TIERS])
def test_threshold_boundary_beyond_oversample(tmp_path, monkeypatch, tier,
                                              env):
    """The hard case VERDICT r3 Weak #6 asked for: the number of rows
    within quantization noise of the threshold far EXCEEDS the tier's
    calibrated oversample window (4*top_k for int8). The candidate pool
    must grow until it provably holds every within-threshold row (the
    quantized-distance completion criterion), or the served top_k can
    silently swap a true hit for a noise-tied neighbor."""
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    rng = np.random.default_rng(99)
    s, q, rows = _fill(tmp_path, rng, fragmented=True, per_shell=100)
    n = s.count_line_embeddings()
    for k, v in env.items():
        if v == "small":
            v = str(s._slot_rows(n) * 32)
        monkeypatch.setenv(k, v)
    top_k = 5  # oversample window = 20 << ~400 within-threshold rows
    want = _exact_hits(q, rows, top_k)
    got = s.search_line_embeddings(q, ["/a.txt"], top_k=top_k,
                                   max_distance=THRESH)
    got_pairs = [(rl.line_number, rl.distance) for rl in got]
    assert [p[0] for p in got_pairs] == [p[0] for p in want], (
        f"{tier}: adversarial boundary hit set diverged\n"
        f"got  {got_pairs}\nwant {want}"
    )
    s.close()


@pytest.mark.parametrize("tier,env", TIERS, ids=[t[0] for t in TIERS])
def test_dense_cluster_topk_completion(tmp_path, monkeypatch, tier, env):
    """TOP-K (no threshold) completion under quantization noise: a dense
    cluster puts FAR more rows within the tier's sim error of the true
    top-k than any fixed oversample window holds. The margin-bounded
    completion (store._search_slot_cached_batched) must grow the pool
    until the served set equals the exact one. Found by the
    capacity-ladder smoke: reduced-64d recall measured 0.81 on a
    5000-rows-per-cluster corpus with the corpus-size-scaled oversample
    alone (VERDICT r3 Weak #5)."""
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    rng = np.random.default_rng(4)
    # one dense cluster of 3000 rows + background
    center = rng.standard_normal(DIM).astype(np.float32)
    rows = center + 0.15 * rng.standard_normal((3000, DIM)).astype(np.float32)
    bg = rng.standard_normal((500, DIM)).astype(np.float32)
    rows = np.concatenate([rows, bg]).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    s = Store(str(tmp_path / "ws"), dim=DIM)
    s.upsert_document_lines("/a.txt", rows)
    n = s.count_line_embeddings()
    for k, v in env.items():
        if v == "small":
            v = str(s._slot_rows(n) * 32)
        monkeypatch.setenv(k, v)
    # a fixed window would hold ~40-2048 candidates; the cluster's 3000
    # noise-tied rows need the completion loop
    q = rows[17] + 0.05 * rng.standard_normal(DIM).astype(np.float32)
    q /= np.linalg.norm(q)
    d = 1.0 - rows.astype(np.float64) @ q.astype(np.float64)
    want = list(np.lexsort((np.arange(len(d)), d))[:10])
    got = s.search_line_embeddings(q, ["/a.txt"], top_k=10)
    assert [rl.line_number for rl in got] == want, f"{tier}: topk diverged"
    s.close()


def test_reduced_tier_outlier_row_is_served(tmp_path, monkeypatch):
    """Adversarial case from review r4: one rare-topic row whose
    residual is CONCENTRATED along a discarded direction, queried by a
    vector aligned with that direction. Its projected rank is thousands
    of positions below its exact rank, and its per-row error dwarfs any
    RMS-scale statistical margin — the corpus second moment barely moves
    for one row in 30k. The residual-norm column (r5 optimistic-bound
    design) must surface it: its large stored r_i boosts its optimistic
    similarity for any high-q_perp query, so selection reaches it and
    the exact re-rank serves it."""
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    rng = np.random.default_rng(11)
    n, d, rd = 30000, 64, 16
    # bulk: rows inside the kept 16-dim subspace, small residual noise
    kept = rng.standard_normal((n, rd)).astype(np.float32)
    rows = np.zeros((n, d), np.float32)
    rows[:, :rd] = kept
    rows[:, rd:] = 0.03 * rng.standard_normal((n, d - rd)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    # the outlier: modest kept-space agreement + a big discarded-direction
    # component the projection throws away entirely
    u = rows[5] / np.linalg.norm(rows[5])
    outlier = 0.3 * u.copy()
    outlier[20] += 0.8
    outlier /= np.linalg.norm(outlier)
    rows[-1] = outlier

    s = Store(str(tmp_path / "ws"), dim=d)
    s.upsert_document_lines("/a.txt", rows)
    monkeypatch.setenv("SEMTOOLS_TPU_REDUCED_DIM", str(rd))
    # below the int4 rung's d/2 B/row so the reduced tier serves
    monkeypatch.setenv(
        "SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(s._slot_rows(n) * 24)
    )
    kind, got_rd = s._device_kind(n)
    assert (kind, got_rd) == ("int8", rd)

    q = 0.65 * u.copy()
    q[20] += 0.76
    q /= np.linalg.norm(q)
    dist = 1.0 - rows.astype(np.float64) @ q.astype(np.float64)
    want = list(np.lexsort((np.arange(n), dist))[:10])
    assert want[0] == n - 1  # the outlier IS the true nearest neighbor
    got = s.search_line_embeddings(q, ["/a.txt"], top_k=10)
    assert [rl.line_number for rl in got] == want, (
        "outlier row dropped from the served top-k"
    )
    s.close()
