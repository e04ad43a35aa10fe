"""Fused Pallas scan kernel vs the XLA reference scan (interpreter mode).

The kernel must be bit-identical in selection to topk_scan: same indices,
same tie-breaks (lower corpus index wins), same distances up to matmul
precision. Runs in Pallas interpreter mode on the CPU test backend.
"""

from __future__ import annotations

import numpy as np
import pytest

from semtools_tpu.ops.pallas_scan import TILE_N, pallas_topk_scan
from semtools_tpu.ops.scan import topk_scan


def _unit_rows(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("n,k,q", [
    (10, 3, 1),        # single short tile, heavy padding
    (257, 5, 2),       # non-aligned n
    (TILE_N, 4, 3),    # exactly one tile
    (TILE_N + 1, 4, 1),  # just over a tile boundary
    (3 * TILE_N + 77, 10, 2),  # multi-tile with ragged tail
])
def test_matches_xla_scan(n, k, q):
    rng = np.random.default_rng(n * 31 + k)
    e = _unit_rows(rng, n, 64)
    qq = _unit_rows(rng, q, 64)
    d_ref, i_ref = topk_scan(qq, e, k)
    d_pal, i_pal = pallas_topk_scan(qq, e, k, interpret=True)
    np.testing.assert_array_equal(i_pal, i_ref)
    np.testing.assert_allclose(d_pal, d_ref, atol=1e-5)


def test_two_phase_path_matches_xla():
    # num_tiles > 2*Q*k forces the tile-max + rescan path.
    from semtools_tpu.ops.pallas_scan import _two_phase_topk
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n = 6 * TILE_N
    e = _unit_rows(rng, n, 64)
    q = _unit_rows(rng, 1, 64)
    d_ref, i_ref = topk_scan(q, e, 2)
    d_pal, i_pal = pallas_topk_scan(q, e, 2, interpret=True)  # dispatches two-phase
    np.testing.assert_array_equal(i_pal, i_ref)
    np.testing.assert_allclose(d_pal, d_ref, atol=1e-5)
    # and directly, with more queries/k
    q3 = _unit_rows(rng, 3, 64)
    d2, i2 = _two_phase_topk(jnp.asarray(q3), jnp.asarray(e), k=4, n_true=n, interpret=True)
    d_ref3, i_ref3 = topk_scan(q3, e, 4)
    np.testing.assert_array_equal(np.asarray(i2), i_ref3)
    np.testing.assert_allclose(np.asarray(d2), d_ref3, atol=1e-5)


def test_two_phase_tie_break_across_tiles():
    # A duplicated vector whose copy lives in a tile with a HIGHER max:
    # the merge must still prefer the lower corpus index.
    from semtools_tpu.ops.pallas_scan import _two_phase_topk
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    n = 6 * TILE_N
    e = _unit_rows(rng, n, 32)
    q = _unit_rows(rng, 1, 32)
    # v has sim ~0.9 to q — far above the ~0.7 max of random 32-d rows.
    ortho = _unit_rows(rng, 1, 32)[0]
    ortho -= (ortho @ q[0]) * q[0]
    ortho /= np.linalg.norm(ortho)
    v = 0.9 * q[0] + np.sqrt(1 - 0.81) * ortho
    # tile 1 contains the query itself (tile max 1.0) AND a copy of v;
    # tile 4's best row is its v copy. Tile 1 ranks first on tile max, so
    # its v-candidate appears earlier in phase-2 order — but the copies
    # tie on value and the LOWER corpus index must win regardless.
    e[TILE_N + 5] = q[0]
    e[TILE_N + 9] = v        # lower-index copy, in the stronger tile
    e[4 * TILE_N + 3] = v    # higher-index copy, in a weaker tile
    d, i = _two_phase_topk(jnp.asarray(q), jnp.asarray(e), k=3, n_true=n, interpret=True)
    i = np.asarray(i)[0]
    assert list(i) == [TILE_N + 5, TILE_N + 9, 4 * TILE_N + 3], i


def test_k_larger_than_n():
    rng = np.random.default_rng(0)
    e = _unit_rows(rng, 7, 32)
    q = _unit_rows(rng, 1, 32)
    d_pal, i_pal = pallas_topk_scan(q, e, 50, interpret=True)
    d_ref, i_ref = topk_scan(q, e, 50)
    assert d_pal.shape == (1, 7)
    np.testing.assert_array_equal(i_pal, i_ref)
    np.testing.assert_allclose(d_pal, d_ref, atol=1e-5)


def test_duplicate_rows_tie_break_prefers_lower_index():
    # Duplicate vectors across tile boundaries: the lower corpus index must
    # win, matching the reference's stable sort (src/search/mod.rs:107).
    rng = np.random.default_rng(3)
    base = _unit_rows(rng, TILE_N + 50, 32)
    base[TILE_N + 10] = base[5]  # duplicate in a later tile
    q = base[5:6]
    d, i = pallas_topk_scan(q, base, 2, interpret=True)
    assert i[0, 0] == 5
    assert i[0, 1] == TILE_N + 10
    np.testing.assert_allclose(d[0, 0], d[0, 1], atol=1e-6)


def test_empty_corpus():
    q = np.zeros((1, 16), np.float32)
    e = np.zeros((0, 16), np.float32)
    d, i = pallas_topk_scan(q, e, 3, interpret=True)
    assert d.shape == (1, 0) and i.shape == (1, 0)


def test_zero_vector_rows_rank_last():
    rng = np.random.default_rng(4)
    e = _unit_rows(rng, 20, 16)
    e[7] = 0.0  # empty-line embedding
    q = e[3:4]
    d, i = pallas_topk_scan(q, e, 20, interpret=True)
    # zero row has distance exactly 1.0; every similar row ranks above it
    pos = list(i[0]).index(7)
    np.testing.assert_allclose(d[0, pos], 1.0, atol=1e-6)


def test_batched_queries_rejected():
    # q > _MAX_TWO_PHASE_Q must stay on the XLA path (see _use_pallas);
    # calling the pallas scan directly asserts.
    rng = np.random.default_rng(21)
    e = _unit_rows(rng, 3 * TILE_N, 32)
    q = _unit_rows(rng, 70, 32)
    with pytest.raises(AssertionError):
        pallas_topk_scan(q, e, 4, interpret=True)
    # the public dispatcher handles it fine
    d_ref, i_ref = topk_scan(q, e, 4)
    assert d_ref.shape == (70, 4)


def test_bucket_pad_passthrough_for_caller_padded():
    """Store serving corpora arrive pre-padded (n_true < rows, rows a
    tile multiple) and must pass through UNCHANGED — re-bucketing would
    copy the whole corpus on device every query (round-2 review)."""
    import jax.numpy as jnp

    from semtools_tpu.ops.pallas_scan import bucket_pad_rows

    # store-style: bucket_rows padding, not a power of two
    e = jnp.zeros((507904, 8), jnp.float32)  # 62 * 8192
    out = bucket_pad_rows(e, 8192, n_true=500000)
    assert out is e
    # ad-hoc (no caller padding): bucketed up to the pow2 tile multiple
    e2 = jnp.zeros((20000, 8), jnp.float32)
    out2 = bucket_pad_rows(e2, 2048, n_true=None)
    assert out2.shape[0] == 32768
    # caller n_true but NOT tile-aligned: still bucketed (pow2 of rows)
    e3 = jnp.zeros((5000, 8), jnp.float32)
    out3 = bucket_pad_rows(e3, 2048, n_true=4000)
    assert out3.shape[0] == 8192
