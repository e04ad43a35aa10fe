"""Daemon read coalescing (store/coalesce.py): concurrent same-shape
batched searches merge into ONE underlying device dispatch with
per-caller results identical to direct execution.

Motivating measurement: 8 parallel daemon reads cost 171x one batched
search on the tunneled link (RESULTS_TPU `daemon_parallel_reads`) —
per-request readback rides the link RTT floor; one merged scan pays it
once.
"""

from __future__ import annotations

import threading

import numpy as np
import pytest

from semtools_tpu.store import coalesce, device_cache
from semtools_tpu.store.store import Store


@pytest.fixture(autouse=True)
def coalesce_on(monkeypatch):
    device_cache.invalidate()
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    monkeypatch.setattr(coalesce, "_enabled", True)
    monkeypatch.setattr(coalesce, "_stats", [0, 0])
    monkeypatch.setattr(coalesce, "_open", {})
    yield
    device_cache.invalidate()


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _mk(tmp_path, n=400, d=32):
    s = Store(str(tmp_path / "ws"), dim=d)
    rows = _unit(np.random.default_rng(5), n, d)
    s.upsert_document_lines("/a.txt", rows[: n // 2])
    s.upsert_document_lines("/b.txt", rows[n // 2 :])
    return s, rows


def test_concurrent_searches_merge_and_match_direct(tmp_path, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_COALESCE_WINDOW_MS", "120")
    s, rows = _mk(tmp_path)
    paths = ["/a.txt", "/b.txt"]
    qs = _unit(np.random.default_rng(9), 6, 32)

    # direct (coalescing bypassed): the authority
    want = [s._search_batched_retry(qs[i : i + 1], paths, 5) for i in range(6)]

    # count underlying scans
    calls = []
    real = Store._search_batched_retry

    def counting(self, q, p, k, md=None):
        calls.append(q.shape[0])
        return real(self, q, p, k, md)

    monkeypatch.setattr(Store, "_search_batched_retry", counting)

    results = [None] * 6
    errs = []

    def worker(i):
        try:
            st = Store(str(tmp_path / "ws"), dim=32)
            try:
                results[i] = st.search_line_embeddings_batched(
                    qs[i : i + 1], paths, 5
                )
            finally:
                st.close()
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    # all six callers merged into ONE underlying scan of 6 rows (the
    # 120 ms window comfortably covers thread startup skew)
    assert calls == [6], calls
    merged, merged_q = coalesce.stats()
    assert merged == 1 and merged_q == 6
    for i in range(6):
        got, ref = results[i][0], want[i][0]
        assert [(r.path, r.line_number) for r in got] == [
            (r.path, r.line_number) for r in ref
        ]
        assert np.allclose(
            [r.distance for r in got], [r.distance for r in ref], atol=1e-6
        )


def test_different_shapes_do_not_merge(tmp_path, monkeypatch):
    """Different path subsets / top_k / thresholds must never share a
    batch — each key scans separately and exactly."""
    monkeypatch.setenv("SEMTOOLS_TPU_COALESCE_WINDOW_MS", "60")
    s, rows = _mk(tmp_path)
    q = _unit(np.random.default_rng(11), 1, 32)

    shapes = [
        (["/a.txt"], 3, None),
        (["/b.txt"], 3, None),
        (["/a.txt", "/b.txt"], 5, None),
        (["/a.txt", "/b.txt"], 5, 0.9),
    ]
    want = [s._search_batched_retry(q, p, k, md) for p, k, md in shapes]

    results = [None] * len(shapes)

    def worker(i):
        p, k, md = shapes[i]
        st = Store(str(tmp_path / "ws"), dim=32)
        try:
            results[i] = st.search_line_embeddings_batched(q, p, k, md)
        finally:
            st.close()

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(len(shapes))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    merged, _ = coalesce.stats()
    assert merged == 0  # nothing shared a key
    for i in range(len(shapes)):
        got, ref = results[i][0], want[i][0]
        assert [(r.path, r.line_number, round(r.distance, 6)) for r in got] \
            == [(r.path, r.line_number, round(r.distance, 6)) for r in ref]


def test_leader_error_falls_back_per_follower(tmp_path, monkeypatch):
    """A leader-side failure must not fail its window-mates: followers
    re-run directly on their own store."""
    monkeypatch.setenv("SEMTOOLS_TPU_COALESCE_WINDOW_MS", "120")
    s, rows = _mk(tmp_path)
    paths = ["/a.txt", "/b.txt"]
    qs = _unit(np.random.default_rng(13), 3, 32)

    real = Store._search_batched_retry
    state = {"first": True}

    def flaky(self, q, p, k, md=None):
        if state["first"] and q.shape[0] > 1:
            state["first"] = False
            raise RuntimeError("injected leader fault")
        return real(self, q, p, k, md)

    monkeypatch.setattr(Store, "_search_batched_retry", flaky)

    results = [None] * 3
    errors = [None] * 3

    def worker(i):
        try:
            st = Store(str(tmp_path / "ws"), dim=32)
            try:
                results[i] = st.search_line_embeddings_batched(
                    qs[i : i + 1], paths, 4
                )
            finally:
                st.close()
        except BaseException as e:  # noqa: BLE001
            errors[i] = e

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # exactly one caller (the leader) sees the injected error; everyone
    # else gets correct results from their direct fallback
    assert sum(e is not None for e in errors) == 1
    want = real(s, qs, paths, 4)
    for i in range(3):
        if errors[i] is not None:
            continue
        got, ref = results[i][0], want[i]
        assert [(r.path, r.line_number) for r in got] == [
            (r.path, r.line_number) for r in ref
        ]
