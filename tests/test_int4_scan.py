"""Int4-packed fused scan: packing, selection parity, ranking fidelity."""

from __future__ import annotations

import numpy as np

from semtools_tpu.ops.int4_scan import (
    TILE_N,
    int4_deep_candidates,
    int4_topk_scan,
    pack_int4,
    quantize_pack_global,
    tile_for_rows,
    unpack_int4,
)
from semtools_tpu.ops.int8_scan import quantize_global
from semtools_tpu.ops.scan import topk_scan


def _unit_rows(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _int_sims(q, p4):
    """Host oracle: exact integer sims of int8 queries vs unpacked int4."""
    q8, q_scale = quantize_global(q)
    e4 = unpack_int4(p4)
    return (
        q8.astype(np.int64) @ e4.astype(np.int64).T
    ).astype(np.float64), q_scale


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-7, 8, size=(50, 64)).astype(np.int8)
    np.testing.assert_array_equal(unpack_int4(pack_int4(q)), q)
    # Full nibble range incl. -8 survives the two's-complement packing.
    edge = np.array([[-8, -7, -1, 0, 1, 7, -8, 7]], np.int8)
    np.testing.assert_array_equal(unpack_int4(pack_int4(edge)), edge)


def test_quantize_pack_accuracy():
    rng = np.random.default_rng(1)
    x = _unit_rows(rng, 100, 256)
    p4, scale = quantize_pack_global(x)
    assert p4.shape == (100, 128) and p4.dtype == np.int8
    back = unpack_int4(p4).astype(np.float32) * scale
    # 4-bit quantization of unit-norm rows: sims within ~0.05.
    sims_f = x @ x[0]
    sims_q = back @ back[0]
    np.testing.assert_allclose(sims_q, sims_f, atol=6e-2)


def test_zero_corpus_and_odd_dim():
    from semtools_tpu.ops.int4_scan import PACKED_ZERO_BYTE

    p4, scale = quantize_pack_global(np.zeros((3, 16), np.float32))
    # Zero VECTORS pack to the biased zero byte, not 0x00 — the slot
    # corpus's freed-slot invariant depends on it.
    assert np.all(p4 == PACKED_ZERO_BYTE) and scale == 0.0
    assert p4.shape == (3, 8)
    np.testing.assert_array_equal(unpack_int4(p4), np.zeros((3, 16), np.int8))
    try:
        quantize_pack_global(np.zeros((2, 7), np.float32))
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("odd dim must be rejected")


def test_selection_exact_over_quantized_sims():
    # The kernel must select exactly the brute-force top-k of the integer
    # similarities (int4 corpus x int8 query), ties to the lower index.
    rng = np.random.default_rng(2)
    centers = _unit_rows(rng, 10, 64)
    rows = np.repeat(centers, 40, axis=0) + 0.02 * rng.standard_normal(
        (400, 64)
    ).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    p4, es = quantize_pack_global(rows)
    q = centers[:2]
    d_q, i_q = int4_topk_scan(q, p4, es, 5, interpret=True)
    int_sims, qs = _int_sims(q, p4)
    for qi in range(2):
        order = np.lexsort((np.arange(400), -int_sims[qi]))[:5]
        np.testing.assert_array_equal(i_q[qi], order)
        np.testing.assert_allclose(
            d_q[qi], 1.0 - int_sims[qi][order] * qs * es, atol=1e-5
        )


def test_ranking_matches_f32_scan_with_real_margins():
    # Planted similarities spaced 0.15 apart — well above int4
    # quantization noise (~0.04 at d=64) — must rank identically to the
    # f32 scan.
    rng = np.random.default_rng(6)
    q = _unit_rows(rng, 1, 64)
    rows = _unit_rows(rng, 200, 64)
    rows -= (rows @ q[0])[:, None] * q[0]
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    planted = [17, 58, 101, 160, 199]
    for rank, j in enumerate(planted):
        a = 0.9 - 0.15 * rank
        rows[j] = a * q[0] + np.sqrt(1 - a * a) * rows[j]
    p4, es = quantize_pack_global(rows)
    d_ref, i_ref = topk_scan(q, rows, 5)
    d_q, i_q = int4_topk_scan(q, p4, es, 5, interpret=True)
    np.testing.assert_array_equal(i_q[0], planted)
    np.testing.assert_array_equal(i_ref[0], planted)
    np.testing.assert_allclose(d_q[0], d_ref[0], atol=8e-2)


def test_multi_tile_and_padding():
    rng = np.random.default_rng(3)
    n = TILE_N + 123
    rows = _unit_rows(rng, n, 64)
    target = _unit_rows(rng, 1, 64)
    rows[TILE_N + 7] = 0.98 * target[0] + 0.02 * rows[0]
    rows[TILE_N + 7] /= np.linalg.norm(rows[TILE_N + 7])
    p4, es = quantize_pack_global(rows)
    d, i = int4_topk_scan(target, p4, es, 3, interpret=True)
    assert i[0, 0] == TILE_N + 7
    assert d.shape == (1, 3)
    assert np.all(np.diff(d[0]) >= -1e-6)


def test_k_exceeds_n():
    rng = np.random.default_rng(4)
    rows = _unit_rows(rng, 5, 32)
    p4, es = quantize_pack_global(rows)
    d, i = int4_topk_scan(rows[:1], p4, es, 20, interpret=True)
    assert d.shape == (1, 5)
    assert sorted(map(int, i[0])) == [0, 1, 2, 3, 4]


def test_int4_masked_matches_numpy(rng):
    """Masked two-phase: selection over the masked quantized sims equals
    the numpy oracle, ties to the lower corpus index."""
    import jax.numpy as jnp

    n, d, k = 1500, 32, 7
    e = _unit_rows(rng, n, d)
    q = _unit_rows(rng, 3, d)
    p4, scale = quantize_pack_global(e)
    mask_np = (rng.random(n) < 0.4).astype(np.int8)
    mask_np[:k] = 1

    d_got, i_got = int4_topk_scan(q, p4, scale, k, mask=jnp.asarray(mask_np))
    int_sims, q_scale = _int_sims(q, p4)
    for r in range(3):
        s = int_sims[r].copy()
        s[mask_np == 0] = -np.inf
        order = np.lexsort((np.arange(n), -s))[:k]
        assert list(i_got[r]) == list(order), r
        np.testing.assert_allclose(
            d_got[r], 1.0 - s[order] * (q_scale * scale), rtol=1e-5
        )


def test_oversampled_candidates_contain_f32_topk():
    """The store serves int4 through an oversampled exact re-rank: the
    true f32 top-10 must sit inside the int4 scan's candidate set at the
    tier's oversample depth on a realistic clustered corpus."""
    rng = np.random.default_rng(7)
    d = 256
    centers = _unit_rows(rng, 32, d)
    rows = np.repeat(centers, 640, axis=0) + 0.08 * rng.standard_normal(
        (32 * 640, d)
    ).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    n = len(rows)
    p4, es = quantize_pack_global(rows)
    q = _unit_rows(rng, 4, d) * 0.3 + centers[:4] * 0.7
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    depth = 512  # int4 tier floor is far above this; see store policy
    _, i4 = int4_topk_scan(q, p4, es, depth, interpret=True)
    _, i_exact = topk_scan(q, rows, 10)
    for r in range(len(q)):
        assert set(i_exact[r].tolist()) <= set(i4[r].tolist()), (
            f"query {r}: f32 top-10 escaped the int4 depth-{depth} pool"
        )


def _clustered(rng, n_centers, per, d, noise=0.08):
    centers = _unit_rows(rng, n_centers, d)
    rows = np.repeat(centers, per, axis=0) + noise * rng.standard_normal(
        (n_centers * per, d)
    ).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    return centers, rows


def test_deep_candidates_contain_f32_topk():
    """The serving-tier path: the margin-threshold extraction must hold
    every true f32 top-10 row (candidate recall == served recall after
    the store's exact re-rank)."""
    rng = np.random.default_rng(11)
    d = 256
    centers, rows = _clustered(rng, 32, 640, d)
    n = len(rows)
    p4, es = quantize_pack_global(rows)
    q = _unit_rows(rng, 5, d) * 0.3 + centers[:5] * 0.7
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ids = int4_deep_candidates(q, p4, interpret=True)
    assert ids.shape[0] == 5 and ids.dtype == np.int32
    _, i_exact = topk_scan(q, rows, 10)
    for r in range(len(q)):
        got = set(int(x) for x in ids[r] if x < n)
        assert set(i_exact[r].tolist()) <= got, (
            f"query {r}: f32 top-10 escaped the deep-candidate pool "
            f"({len(got)} candidates)"
        )
        # no duplicates among real candidates (unordered contract)
        valid = ids[r][ids[r] < n]
        assert len(np.unique(valid)) == len(valid)


def test_deep_candidates_masked():
    """Masked extraction: no masked-out row is ever returned, and the
    masked f32 top-10 survives."""
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    d = 64
    centers, rows = _clustered(rng, 8, 200, d)
    n = len(rows)
    p4, es = quantize_pack_global(rows)
    mask_np = (rng.random(n) < 0.5).astype(np.int8)
    mask_np[:10] = 1
    q = centers[:3]
    ids = int4_deep_candidates(q, p4, mask=jnp.asarray(mask_np),
                               interpret=True)
    sims = rows @ q.T
    for r in range(3):
        got = [int(x) for x in ids[r] if x < n]
        assert all(mask_np[g] == 1 for g in got), "masked row leaked"
        s = sims[:, r].copy()
        s[mask_np == 0] = -np.inf
        exact = np.argsort(-s, kind="stable")[:10]
        assert set(exact.tolist()) <= set(got)


def test_deep_candidates_edges():
    """Empty corpus, corpus smaller than k_cut, and n_true padding."""
    rng = np.random.default_rng(13)
    rows = _unit_rows(rng, 6, 32)
    p4, es = quantize_pack_global(rows)
    # n == 0
    out = int4_deep_candidates(rows[:2], p4, n_true=0, interpret=True)
    assert out.shape == (2, 0)
    # fewer rows than k_cut=10: every real row must be a candidate
    ids = int4_deep_candidates(rows[:2], p4, interpret=True)
    for r in range(2):
        got = set(int(x) for x in ids[r] if x < 6)
        assert got == set(range(6))
    # n_true < len(p4): padding rows never surface
    ids2 = int4_deep_candidates(rows[:1], p4, n_true=4, interpret=True)
    got2 = [int(x) for x in ids2[0] if x < 4]
    assert set(got2) == set(range(4))
    assert all(int(x) >= 4 for x in ids2[0] if x not in got2)


def test_tile_for_rows_contract():
    """Tiles are powers of two in [SUB_N, TILE_N]; large query batches
    shrink the tile to hold the phase-1 sims budget (ADVICE r3)."""
    from semtools_tpu.ops.pallas_scan import SUB_N

    for n in (1, 100, SUB_N, 5000, TILE_N, 10 * TILE_N + 3):
        for qn in (1, 8, 64, 512):
            t = tile_for_rows(n, qn)
            assert SUB_N <= t <= TILE_N
            assert t & (t - 1) == 0
            assert qn * t * 4 <= (1 << 20) or t == SUB_N
    assert tile_for_rows(10 * TILE_N, 8) == TILE_N
