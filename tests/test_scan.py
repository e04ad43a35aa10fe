import numpy as np
import pytest

import semtools_tpu.ops.scan as scan_mod
from semtools_tpu.ops.scan import cosine_distances, threshold_scan, topk_scan


def _unit_rows(rng, n, d):
    m = rng.standard_normal((n, d)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def test_cosine_distances_vs_numpy(rng):
    q = _unit_rows(rng, 3, 32)
    e = _unit_rows(rng, 50, 32)
    got = np.asarray(cosine_distances(q, e))
    want = 1.0 - q @ e.T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_hand_checked_distances():
    # Orthogonal / identical / opposite vectors have distances 1 / 0 / 2.
    q = np.array([[1.0, 0.0]], np.float32)
    e = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]], np.float32)
    got = np.asarray(cosine_distances(q, e))[0]
    np.testing.assert_allclose(got, [0.0, 1.0, 2.0], atol=1e-6)


def test_topk_sorted_and_correct(rng):
    q = _unit_rows(rng, 2, 16)
    e = _unit_rows(rng, 100, 16)
    d, i = topk_scan(q, e, 5)
    assert d.shape == (2, 5) and i.shape == (2, 5)
    full = 1.0 - q @ e.T
    for row in range(2):
        want_idx = np.argsort(full[row], kind="stable")[:5]
        np.testing.assert_array_equal(i[row], want_idx)
        assert np.all(np.diff(d[row]) >= -1e-6)


def test_topk_k_larger_than_n(rng):
    q = _unit_rows(rng, 1, 8)
    e = _unit_rows(rng, 3, 8)
    d, i = topk_scan(q, e, 10)
    assert d.shape == (1, 3)


def test_topk_tie_break_prefers_lower_index():
    q = np.array([[1.0, 0.0]], np.float32)
    e = np.array([[0.0, 1.0], [1.0, 0.0], [1.0, 0.0]], np.float32)
    _, i = topk_scan(q, e, 2)
    np.testing.assert_array_equal(i[0], [1, 2])


def test_threshold_scan_strictness():
    q = np.array([[1.0, 0.0]], np.float32)
    e = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]], np.float32)
    d, i = threshold_scan(q, e, 1.0)  # strictly below 1.0 keeps only the exact match
    np.testing.assert_array_equal(i, [0])
    np.testing.assert_allclose(d, [0.0], atol=1e-6)


def test_threshold_scan_returns_all_below(rng):
    q = _unit_rows(rng, 1, 16)
    e = _unit_rows(rng, 200, 16)
    d, i = threshold_scan(q, e, 1.05)
    full = 1.0 - (q @ e.T)[0]
    assert len(i) == int((full < 1.05).sum())
    assert np.all(np.diff(d) >= -1e-6)


def test_chunked_scan_equals_unchunked(rng, monkeypatch):
    q = _unit_rows(rng, 2, 16)
    e = _unit_rows(rng, 301, 16)
    d_want, i_want = topk_scan(q, e, 7)
    monkeypatch.setattr(scan_mod, "SCAN_CHUNK", 64)
    d_got, i_got = topk_scan(q, e, 7)
    np.testing.assert_allclose(d_got, d_want, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i_got, i_want)


def test_zero_vector_line_gets_distance_one(rng):
    q = _unit_rows(rng, 1, 8)
    e = np.zeros((2, 8), np.float32)
    e[0] = q[0]
    d = np.asarray(cosine_distances(q, e))[0]
    np.testing.assert_allclose(d, [0.0, 1.0], atol=1e-6)


def test_threshold_device_compaction_matches_host():
    # Corpus above _THRESHOLD_DEVICE_MIN_ROWS exercises the device-side
    # compaction path; results must match the host path exactly.
    import numpy as np

    from semtools_tpu.ops import scan as scan_mod

    rng = np.random.default_rng(17)
    n = scan_mod._THRESHOLD_DEVICE_MIN_ROWS + 123
    e = rng.standard_normal((n, 32)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = e[42:43].copy()
    # plant some exact/near hits incl. in the padded tail region
    e[n - 3] = q[0]
    d_dev, i_dev = scan_mod.threshold_scan(q, e, 0.4)

    dists = (1.0 - e @ q[0])
    keep = np.nonzero(dists < 0.4)[0]
    order = np.argsort(dists[keep], kind="stable")
    keep = keep[order]
    np.testing.assert_array_equal(i_dev, keep)
    np.testing.assert_allclose(d_dev, dists[keep], atol=1e-5)
    assert 42 in set(map(int, i_dev)) and (n - 3) in set(map(int, i_dev))


def test_threshold_device_compaction_no_hits_and_n_true():
    import numpy as np

    from semtools_tpu.ops import scan as scan_mod

    rng = np.random.default_rng(18)
    n = scan_mod._THRESHOLD_DEVICE_MIN_ROWS
    e = rng.standard_normal((n, 16)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = rng.standard_normal((1, 16)).astype(np.float32)
    q /= np.linalg.norm(q)
    d, i = scan_mod.threshold_scan(q, e, 1e-9)
    assert d.shape == (0,) and i.shape == (0,)
    # n_true excludes a planted hit in the padding region
    e[n - 1] = q[0]
    d2, i2 = scan_mod.threshold_scan(q, e, 0.1, n_true=n - 1)
    assert (n - 1) not in set(map(int, i2))


def test_blocked_chunk_equals_plain(rng):
    """The XLA blocked two-phase (_topk_chunk_blocked) must equal the
    plain matmul+top_k chunk on values AND indices, including value ties
    (duplicate rows) and n_true padding."""
    import jax.numpy as jnp

    n, d, k = 4096, 16, 7
    e = _unit_rows(rng, n, d)
    # plant exact duplicates across different blocks to force ties
    e[1000] = e[3500] = e[77]
    e[2048] = e[2560]
    q = np.concatenate([_unit_rows(rng, 3, d), e[77][None, :]], axis=0)
    for n_true in (n, n - 700):
        d_plain, i_plain = scan_mod._topk_chunk(
            jnp.asarray(q), jnp.asarray(e), 0, n_true, k=k
        )
        d_blk, i_blk = scan_mod._topk_chunk_blocked(
            jnp.asarray(q), jnp.asarray(e), 0, n_true, k=k
        )
        np.testing.assert_allclose(np.asarray(d_blk), np.asarray(d_plain),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(i_blk), np.asarray(i_plain))


def test_blocked_chunk_nonzero_base(rng):
    """Nonzero base offset (multi-chunk path) with an aligned corpus."""
    import jax.numpy as jnp

    n, d, k = 1536, 8, 5
    e = _unit_rows(rng, n, d)
    q = _unit_rows(rng, 2, d)
    d_plain, i_plain = scan_mod._topk_chunk(
        jnp.asarray(q), jnp.asarray(e), 100, n + 100, k=k
    )
    d_blk, i_blk = scan_mod._topk_chunk_blocked(
        jnp.asarray(q), jnp.asarray(e), 100, n + 100, k=k
    )
    np.testing.assert_allclose(np.asarray(d_blk), np.asarray(d_plain),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_blk), np.asarray(i_plain))


def test_topk_scan_unaligned_corpus_stays_plain_and_correct(rng, monkeypatch):
    """Corpus lengths not divisible by 512 must route to the plain chunk
    (the blocked kernel requires alignment) and stay correct."""
    monkeypatch.setattr(scan_mod, "_XLA_BLOCKED_MIN_ROWS", 1 << 10)
    monkeypatch.setenv("SEMTOOLS_TPU_NO_PALLAS", "1")
    n, d, k = 3001, 8, 4
    e = _unit_rows(rng, n, d)
    q = _unit_rows(rng, 40, d)
    d_got, i_got = topk_scan(q, e, k)
    sims = q @ e.T
    want_i = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(i_got, want_i)


def test_topk_scan_routes_blocked_above_threshold(rng, monkeypatch):
    """End-to-end: a corpus above _XLA_BLOCKED_MIN_ROWS on the XLA path
    returns the same results as the plain chunk path."""
    monkeypatch.setattr(scan_mod, "_XLA_BLOCKED_MIN_ROWS", 1 << 10)
    monkeypatch.setenv("SEMTOOLS_TPU_NO_PALLAS", "1")
    n, d, k = 3072, 8, 4  # 512-aligned so the blocked route engages
    e = _unit_rows(rng, n, d)
    q = _unit_rows(rng, 40, d)  # Q > 32: the batched XLA route
    d_got, i_got = topk_scan(q, e, k)
    sims = q @ e.T
    want_i = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(i_got, want_i)
    np.testing.assert_allclose(
        d_got, 1.0 - np.take_along_axis(sims, want_i, axis=1),
        rtol=1e-5, atol=1e-6,
    )


def test_batched_threshold_scan_matches_reference(rng):
    from semtools_tpu.ops.scan import batched_threshold_scan

    n, d, t = 500, 16, 0.9
    e = _unit_rows(rng, n, d)
    e[100] = e[400] = e[7]  # duplicates: tie-break by corpus order
    q = np.concatenate([_unit_rows(rng, 5, d), e[7][None, :]], axis=0)
    got = batched_threshold_scan(q, e, t)
    assert len(got) == 6
    sims = q @ e.T
    for row, (dd, ii) in enumerate(got):
        dist = 1.0 - sims[row]
        keep = np.nonzero(dist < t)[0]
        order = np.argsort(dist[keep], kind="stable")
        want = keep[order]
        np.testing.assert_array_equal(ii, want)
        np.testing.assert_allclose(dd, dist[want], rtol=1e-5, atol=1e-6)
        assert np.all(dd < t)


def test_batched_threshold_scan_grows_size_and_n_true(rng):
    from semtools_tpu.ops.scan import batched_threshold_scan

    n, d = 400, 8
    e = np.tile(_unit_rows(rng, 1, d), (n, 1))  # every row identical
    q = e[:3].copy()
    got = batched_threshold_scan(q, e, 0.5, n_true=250)  # all 250 real rows hit
    for dd, ii in got:
        assert len(ii) == 250  # > the initial 64 extract size, pads excluded
        np.testing.assert_array_equal(ii, np.arange(250))
