import numpy as np
import pytest

from semtools_tpu.index import IvfPqIndex, kmeans_fit, pq_encode, pq_fit
from semtools_tpu.index.pq import adc_scan
from semtools_tpu.ops.scan import topk_scan
from semtools_tpu.parallel import corpus_mesh


def _clustered(rng, n_clusters=16, per=64, d=32, spread=0.05):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, per, axis=0) + spread * rng.standard_normal(
        (n_clusters * per, d)
    ).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts, centers


def test_kmeans_reduces_quantization_error(rng):
    x, _ = _clustered(rng)
    c1, a1 = kmeans_fit(x, 16, iters=1, seed=0)
    c8, a8 = kmeans_fit(x, 16, iters=8, seed=0)

    def err(c, a):
        return float(np.sum((x - c[a]) ** 2))

    assert err(c8, a8) <= err(c1, a1) + 1e-4


def test_kmeans_sharded_equals_single(rng):
    x, _ = _clustered(rng, n_clusters=4, per=32, d=16)
    c_single, _ = kmeans_fit(x, 4, iters=5, seed=3)
    c_shard, _ = kmeans_fit(x, 4, iters=5, seed=3, mesh=corpus_mesh())
    np.testing.assert_allclose(c_single, c_shard, rtol=1e-4, atol=1e-5)


def test_pq_roundtrip_error_small_on_clustered(rng):
    x, _ = _clustered(rng, d=32)
    pq = pq_fit(x, m=8, iters=5)
    codes = pq_encode(x, pq)
    assert codes.shape == (x.shape[0], 8)
    assert codes.dtype == np.uint8
    # Decode and measure distortion
    decoded = np.concatenate(
        [pq.codebooks[j][codes[:, j]] for j in range(8)], axis=1
    )
    rel_err = np.linalg.norm(decoded - x) / np.linalg.norm(x)
    assert rel_err < 0.35


def test_adc_approximates_exact_sims(rng):
    x, _ = _clustered(rng, d=32)
    q = x[:3] + 0.01
    pq = pq_fit(x, m=8, iters=5)
    codes = pq_encode(x, pq)
    approx_d = adc_scan(q, codes, pq)
    exact_d = 1.0 - q @ x.T
    # mean absolute error of distances should be small on clustered data
    assert np.mean(np.abs(approx_d - exact_d)) < 0.05


def test_ivfpq_recall_at_10(rng):
    x, _ = _clustered(rng, n_clusters=32, per=64, d=32)
    queries = x[rng.choice(len(x), 20, replace=False)] + 0.01 * rng.standard_normal(
        (20, 32)
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    index = IvfPqIndex.build(x, nlist=32, m=8, train_iters=6, seed=0)
    d_got, i_got = index.search(queries, k=10, nprobe=8, rerank=4)

    d_true, i_true = topk_scan(queries, x, 10)
    recall = np.mean(
        [
            len(set(i_got[qi].tolist()) & set(i_true[qi].tolist())) / 10
            for qi in range(len(queries))
        ]
    )
    assert recall >= 0.9, f"recall@10 = {recall}"


def test_ivfpq_rerank_orders_exactly(rng):
    x, _ = _clustered(rng, n_clusters=8, per=32, d=32)
    q = x[:1]
    index = IvfPqIndex.build(x, nlist=8, m=8, train_iters=6)
    d, i = index.search(q, k=5, nprobe=8, rerank=8)
    # With all lists probed and re-ranking on, top-1 must be the exact hit
    d_true, i_true = topk_scan(q, x, 5)
    assert i[0, 0] == i_true[0, 0]
    np.testing.assert_allclose(d[0, 0], d_true[0, 0], atol=1e-5)


def test_ivfpq_native_probe_matches_numpy(rng, monkeypatch):
    """The C++ ADC scan (cpp/adcscan.cpp) and the numpy fallback must agree:
    identical candidate rows, scores to float tolerance, and identical
    end-to-end search results (selection is re-ranked exactly downstream)."""
    from semtools_tpu.utils import native

    if native.adc_lib() is None:
        pytest.skip("native library unavailable on this host")

    x, _ = _clustered(rng, n_clusters=8, per=32, d=32)
    queries = x[:4] + 0.01
    index = IvfPqIndex.build(x, nlist=8, m=8, train_iters=4, seed=1)

    # Direct probe comparison on one query, partial probe set.
    from semtools_tpu.index.pq import adc_tables
    import jax.numpy as jnp

    coarse_dot = queries @ index.centroids.T
    tables = np.ascontiguousarray(
        adc_tables(jnp.asarray(queries), jnp.asarray(index.pq.codebooks)),
        dtype=np.float32,
    )
    lists = np.array([0, 3, 5], dtype=np.int64)
    rows_nat, approx_nat = index._probe(lists, coarse_dot[0], tables[0])
    monkeypatch.setattr(native, "adc_lib", lambda: None)
    rows_np, approx_np = index._probe(lists, coarse_dot[0], tables[0])
    np.testing.assert_array_equal(rows_nat, rows_np)
    np.testing.assert_allclose(approx_nat, approx_np, rtol=1e-5, atol=1e-5)
    monkeypatch.undo()

    # End-to-end search equality (native vs forced-numpy).
    d_nat, i_nat = index.search(queries, k=5, nprobe=4, rerank=4)
    monkeypatch.setattr(native, "adc_lib", lambda: None)
    d_np, i_np = index.search(queries, k=5, nprobe=4, rerank=4)
    np.testing.assert_array_equal(i_nat, i_np)
    np.testing.assert_allclose(d_nat, d_np, rtol=1e-5, atol=1e-5)


def test_ivfpq_save_load_roundtrip(rng, tmp_path):
    x, _ = _clustered(rng, n_clusters=4, per=16, d=16)
    index = IvfPqIndex.build(x, nlist=4, m=4, train_iters=3)
    p = str(tmp_path / "idx.npz")
    index.save(p)
    loaded = IvfPqIndex.load(p)
    q = x[:2]
    d1, i1 = index.search(q, k=3)
    d2, i2 = loaded.search(q, k=3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_fused_assign_encode_matches_separate_passes(rng):
    """The one-pass build kernel (_fused_assign_encode) must produce the
    SAME assignments and PQ codes as the separate kmeans._assign +
    residual + pq._encode reference math it fused (all matmuls at
    HIGHEST precision, so the outputs are byte-identical on a given
    backend)."""
    import jax.numpy as jnp

    from semtools_tpu.index.ivf_pq import _fused_assign_encode
    from semtools_tpu.index.kmeans import _assign
    from semtools_tpu.index.pq import _encode

    d, m = 64, 8
    x = rng.standard_normal((4096, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    centroids, _ = kmeans_fit(x[:1024], 32, iters=5)
    pq = pq_fit(x[:1024] - centroids[np.asarray(
        _assign(jnp.asarray(x[:1024]), jnp.asarray(centroids)))],
        m=m, iters=3)

    cj = jnp.asarray(centroids)
    books = jnp.asarray(pq.codebooks)
    a_f, c_f = _fused_assign_encode(
        jnp.asarray(x), cj, 0.5 * jnp.sum(cj * cj, axis=1),
        books, 0.5 * jnp.sum(books * books, axis=2))

    a_ref = np.asarray(_assign(jnp.asarray(x), cj))
    res = x - centroids[a_ref]
    c_ref = np.asarray(_encode(
        jnp.asarray(res.reshape(len(x), m, d // m)), books))
    assert np.array_equal(np.asarray(a_f), a_ref)
    assert np.array_equal(np.asarray(c_f), c_ref)


def test_ann_build_backend_cost_model(tmp_path, monkeypatch):
    """auto compares TOTAL wall-clock (one fused link pass vs host
    matmul time), not the old 'transfer > 30 s means host' rule that
    routed every capacity-scale build to a 35-minute host path on any
    tunneled link."""
    from semtools_tpu.store import patch_cache, store as store_mod
    from semtools_tpu.store.store import Store

    s = Store(str(tmp_path / "ws"), dim=256)
    monkeypatch.delenv("SEMTOOLS_TPU_ANN_BUILD", raising=False)
    # pretend the accelerator backend is live
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(store_mod, "_HOST_MATMUL_FLOPS", 10e9)  # 10 GFLOP/s

    n = 10_000_000  # corpus 10 GB f32; nlist=4096 -> host ~45 min
    # healthy link, 500 MB/s: one 10 GB pass = 20 s << host -> device
    monkeypatch.setattr(patch_cache, "_large_up_bps", lambda: 500e6)
    assert s._ann_build_backend(n) == "device"
    # degraded tunnel, 50 kB/s: pass = 2.3 days >> host -> cpu
    monkeypatch.setattr(patch_cache, "_large_up_bps", lambda: 50e3)
    assert s._ann_build_backend(n) == "cpu"
    # explicit override always wins
    monkeypatch.setenv("SEMTOOLS_TPU_ANN_BUILD", "device")
    assert s._ann_build_backend(n) == "device"
    monkeypatch.setenv("SEMTOOLS_TPU_ANN_BUILD", "host")
    assert s._ann_build_backend(n) == "cpu"
    s.close()
