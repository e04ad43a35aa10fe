"""Int8 fused scan: quantization quality + selection parity (interpret mode)."""

from __future__ import annotations

import numpy as np

from semtools_tpu.ops.int8_scan import TILE_N, int8_topk_scan, quantize_global
from semtools_tpu.ops.scan import topk_scan


def _unit_rows(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_quantize_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    x = _unit_rows(rng, 100, 256)
    q8, scale = quantize_global(x)
    back = q8.astype(np.float32) * scale
    sims_f = x @ x[0]
    sims_q = back @ back[0]
    np.testing.assert_allclose(sims_q, sims_f, atol=2e-2)


def test_zero_corpus():
    q8, scale = quantize_global(np.zeros((3, 16), np.float32))
    assert np.all(q8 == 0) and scale == 0.0


def test_selection_exact_over_quantized_sims():
    # The kernel must select exactly the brute-force top-k of the integer
    # similarities (quantized corpus x quantized query).
    rng = np.random.default_rng(1)
    centers = _unit_rows(rng, 10, 64)
    rows = np.repeat(centers, 40, axis=0) + 0.02 * rng.standard_normal((400, 64)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    e8, es = quantize_global(rows)
    q = centers[:2]
    q8, qs = quantize_global(q)
    d_q, i_q = int8_topk_scan(q, e8, es, 5, interpret=True)
    int_sims = q8.astype(np.int64) @ e8.astype(np.int64).T
    for qi in range(2):
        expect = np.argsort(-int_sims[qi], kind="stable")[:5]
        np.testing.assert_array_equal(i_q[qi], expect)
        np.testing.assert_allclose(
            d_q[qi], 1.0 - int_sims[qi][expect] * qs * es, atol=1e-5
        )


def test_ranking_matches_f32_scan_with_real_margins():
    # Rows with planted similarities spaced 0.02 apart — an order of
    # magnitude above int8 quantization noise — must rank identically to
    # the f32 scan.
    rng = np.random.default_rng(6)
    q = _unit_rows(rng, 1, 64)
    rows = _unit_rows(rng, 200, 64)
    rows -= (rows @ q[0])[:, None] * q[0]  # orthogonalize background
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    planted = [17, 58, 101, 160, 199]
    for rank, j in enumerate(planted):
        a = 0.9 - 0.02 * rank
        rows[j] = a * q[0] + np.sqrt(1 - a * a) * rows[j]
    e8, es = quantize_global(rows)
    d_ref, i_ref = topk_scan(q, rows, 5)
    d_q, i_q = int8_topk_scan(q, e8, es, 5, interpret=True)
    np.testing.assert_array_equal(i_q[0], planted)
    np.testing.assert_array_equal(i_ref[0], planted)
    np.testing.assert_allclose(d_q[0], d_ref[0], atol=2e-2)


def test_multi_tile_and_padding():
    rng = np.random.default_rng(2)
    n = 3 * TILE_N + 123
    rows = _unit_rows(rng, n, 64)
    target = _unit_rows(rng, 1, 64)
    rows[2 * TILE_N + 7] = 0.98 * target[0] + 0.02 * rows[0]
    rows[2 * TILE_N + 7] /= np.linalg.norm(rows[2 * TILE_N + 7])
    e8, es = quantize_global(rows)
    d, i = int8_topk_scan(target, e8, es, 3, interpret=True)
    assert i[0, 0] == 2 * TILE_N + 7
    assert d.shape == (1, 3)
    assert np.all(np.diff(d[0]) >= -1e-6)  # ascending


def test_k_exceeds_n():
    rng = np.random.default_rng(3)
    rows = _unit_rows(rng, 5, 32)
    e8, es = quantize_global(rows)
    d, i = int8_topk_scan(rows[:1], e8, es, 20, interpret=True)
    assert d.shape == (1, 5)
    assert sorted(map(int, i[0])) == [0, 1, 2, 3, 4]


def test_int8_masked_matches_numpy(rng):
    """Fused masked two-phase (path-subset serving): selection over the
    masked quantized sims must equal the numpy reference, ties to the
    lower corpus index."""
    import jax.numpy as jnp

    from semtools_tpu.ops.int8_scan import int8_topk_scan, quantize_global

    n, d, k = 1500, 32, 7
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = rng.standard_normal((3, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    e8, scale = quantize_global(e)
    mask_np = (rng.random(n) < 0.4).astype(np.int8)
    mask_np[:k] = 1  # guarantee >= k selectable rows

    d_got, i_got = int8_topk_scan(
        q, e8, scale, k, mask=jnp.asarray(mask_np)
    )
    q8, q_scale = quantize_global(q)
    int_sims = (q8.astype(np.int64) @ e8.astype(np.int64).T).astype(np.float64)
    for r in range(3):
        s = int_sims[r].copy()
        s[mask_np == 0] = -np.inf
        order = np.lexsort((np.arange(n), -s))[:k]
        assert list(i_got[r]) == list(order), r
        np.testing.assert_allclose(
            d_got[r], 1.0 - s[order] * (q_scale * scale), rtol=1e-5
        )


def test_int8_masked_fewer_rows_than_k(rng):
    """A mask with fewer than k live rows: filler entries are non-finite
    and carry out-of-mask indices (callers drop by validity)."""
    import jax.numpy as jnp

    from semtools_tpu.ops.int8_scan import int8_topk_scan, quantize_global

    n, d, k = 600, 16, 10
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = e[:1]
    e8, scale = quantize_global(e)
    mask_np = np.zeros(n, np.int8)
    live = [3, 77, 500]
    mask_np[live] = 1
    d_got, i_got = int8_topk_scan(q, e8, scale, k, mask=jnp.asarray(mask_np))
    finite = np.isfinite(d_got[0])
    assert sorted(i_got[0][finite][:3].tolist()) == live or set(
        i_got[0][finite]
    ) >= set(live)
