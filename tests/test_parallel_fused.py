"""Fused per-device scan under shard_map (interpret mode on the CPU mesh)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semtools_tpu.ops.pallas_scan import TILE_N
from semtools_tpu.ops.scan import topk_scan
from semtools_tpu.parallel.mesh import corpus_mesh, shard_corpus
from semtools_tpu.parallel.scan import sharded_topk_fn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs a multi-device (virtual) mesh"
)


def test_fused_local_matches_xla_path():
    n_dev = 4
    mesh = corpus_mesh(n_dev)
    rng = np.random.default_rng(0)
    n_local = 2 * TILE_N + 2048  # not required to be tile-aligned
    n = n_dev * n_local
    e = rng.standard_normal((n, 64)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = rng.standard_normal((2, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    e_sharded, _ = shard_corpus(e, mesh)
    k = 5
    n_local = e_sharded.shape[0] // n_dev  # shard_corpus may bucket-pad
    fn_fused = sharded_topk_fn(mesh, k, n_local, fused=True, interpret=True)
    fn_plain = sharded_topk_fn(mesh, k, n_local, fused=False)
    d_f, i_f = fn_fused(jnp.asarray(q), e_sharded, jnp.int32(n))
    d_p, i_p = fn_plain(jnp.asarray(q), e_sharded, jnp.int32(n))
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_p))
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_p), atol=1e-5)

    d_ref, i_ref = topk_scan(q, e, k)
    np.testing.assert_array_equal(np.asarray(i_f), i_ref)
    np.testing.assert_allclose(np.asarray(d_f), d_ref, atol=1e-5)


def test_int8_sharded_matches_single_device():
    from semtools_tpu.ops.int8_scan import int8_topk_scan, quantize_global
    from semtools_tpu.parallel.scan import sharded_int8_topk_scan

    n_dev = 4
    mesh = corpus_mesh(n_dev)
    rng = np.random.default_rng(5)
    n = n_dev * (TILE_N // 2)  # per-shard below pallas threshold is fine
    e = rng.standard_normal((n, 64)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = e[:2] + 0.01
    e8, es = quantize_global(e)
    d_s, i_s = sharded_int8_topk_scan(q, e8, es, 5, mesh, interpret=True)
    d_1, i_1 = int8_topk_scan(q, e8, es, 5, interpret=True)
    np.testing.assert_array_equal(i_s, i_1)
    np.testing.assert_allclose(d_s, d_1, atol=1e-5)


def test_fused_local_non_tile_aligned_shard_keeps_tail():
    # Regression: the fused branch used to floor at tile boundaries and
    # silently skip each shard's ragged tail rows.
    n_dev = 4
    mesh = corpus_mesh(n_dev)
    rng = np.random.default_rng(9)
    n_local = 2 * TILE_N + 100  # NOT a multiple of TILE_N
    n = n_dev * n_local
    e = rng.standard_normal((n, 32)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = rng.standard_normal((1, 32)).astype(np.float32)
    q /= np.linalg.norm(q)
    # plant the best match in the ragged tail of the last shard
    target = n - 5
    e[target] = 0.98 * q[0] + 0.02 * e[0]
    e[target] /= np.linalg.norm(e[target])

    e_sharded, _ = shard_corpus(e, mesh)
    # shard_corpus may bucket-pad; n_local is the actual per-device rows
    n_local_padded = e_sharded.shape[0] // n_dev
    fn = sharded_topk_fn(mesh, 3, n_local_padded, fused=True, interpret=True)
    d, i = fn(jnp.asarray(q), e_sharded, jnp.int32(n))
    assert int(np.asarray(i)[0, 0]) == target


def test_sharded_threshold_matches_single_device():
    from semtools_tpu.ops.scan import threshold_scan
    from semtools_tpu.parallel.scan import sharded_threshold_scan

    mesh = corpus_mesh(4)
    rng = np.random.default_rng(31)
    n = 4 * 1000 + 37  # ragged: shards get zero padding
    e = rng.standard_normal((n, 32)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = e[5:6].copy()
    e[n - 2] = q[0]  # hit near the padded tail
    d_s, i_s = sharded_threshold_scan(q, e, 0.4, mesh)
    d_1, i_1 = threshold_scan(q, e, 0.4)
    np.testing.assert_array_equal(i_s, i_1)
    np.testing.assert_allclose(d_s, d_1, atol=1e-5)
    assert {5, n - 2} <= set(map(int, i_s))


def test_sharded_threshold_no_hits():
    from semtools_tpu.parallel.scan import sharded_threshold_scan

    mesh = corpus_mesh(4)
    rng = np.random.default_rng(32)
    e = rng.standard_normal((4096, 16)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = rng.standard_normal((1, 16)).astype(np.float32)
    q /= np.linalg.norm(q)
    d, i = sharded_threshold_scan(q, e, 1e-9, mesh)
    assert d.shape == (0,) and i.shape == (0,)


def test_sharded_batched_threshold_matches_single_query():
    from semtools_tpu.ops.scan import batched_threshold_scan
    from semtools_tpu.parallel.scan import (
        sharded_batched_threshold_scan,
        sharded_threshold_scan,
    )

    mesh = corpus_mesh(4)
    rng = np.random.default_rng(41)
    n = 4 * 800 + 53  # ragged: shards get zero padding
    e = rng.standard_normal((n, 32)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    e[300] = e[700] = e[5]  # duplicates: tie-break by corpus order
    q = np.stack([e[5], e[n - 2], e[1234]]) + 0.0
    got = sharded_batched_threshold_scan(q, e, 0.4, mesh)
    assert len(got) == 3
    ref = batched_threshold_scan(q, e, 0.4)
    for (d_b, i_b), (d_r, i_r) in zip(got, ref):
        np.testing.assert_array_equal(i_b, i_r)
        np.testing.assert_allclose(d_b, d_r, atol=1e-5)
    # also agrees with the single-query sharded path row by row
    for row in range(3):
        d_1, i_1 = sharded_threshold_scan(q[row : row + 1], e, 0.4, mesh)
        np.testing.assert_array_equal(got[row][1], i_1)
        np.testing.assert_allclose(got[row][0], d_1, atol=1e-5)


def test_sharded_batched_threshold_no_hits():
    from semtools_tpu.parallel.scan import sharded_batched_threshold_scan

    mesh = corpus_mesh(4)
    rng = np.random.default_rng(42)
    e = rng.standard_normal((4096, 16)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    got = sharded_batched_threshold_scan(q, e, 1e-9, mesh)
    assert len(got) == 2
    for d, i in got:
        assert d.shape == (0,) and i.shape == (0,)


def test_fused_pad_rows_cannot_crowd_out_negative_sims():
    """Review regression: with tile-scale zero padding on the tail shard
    and a corpus whose similarities are all NEGATIVE, the fused kernel
    must not let pad rows (sim 0.0) crowd the true best match out of the
    tail shard's local candidates — each device masks its own pad rows
    in-kernel via the dynamic local n_true."""
    n_dev = 4
    mesh = corpus_mesh(n_dev)
    rng = np.random.default_rng(77)
    q = rng.standard_normal((1, 32)).astype(np.float32)
    q /= np.linalg.norm(q)
    n = 4 * 600 + 11  # ragged; bucketing pads the tail shard heavily
    # every row anti-aligned with q: all sims negative, so zero pads would
    # outrank EVERY real row if unmasked
    e = -q + 0.05 * rng.standard_normal((n, 32)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    # true best (least-negative sim) lives in the very tail (padded shard)
    target = n - 1
    ortho = rng.standard_normal(32).astype(np.float32)
    ortho -= (ortho @ q[0]) * q[0]
    ortho /= np.linalg.norm(ortho)
    e[target] = 0.999 * ortho - 0.045 * q[0]
    e[target] /= np.linalg.norm(e[target])

    from semtools_tpu.ops.scan import topk_scan

    d_ref, i_ref = topk_scan(q, e, 3)

    e_sharded, _ = shard_corpus(e, mesh)
    n_local = e_sharded.shape[0] // n_dev
    assert n_local * n_dev > n  # the scenario really has pad rows
    fn = sharded_topk_fn(mesh, 3, n_local, fused=True, interpret=True)
    d, i = fn(jnp.asarray(q), e_sharded, jnp.int32(n))
    np.testing.assert_array_equal(np.asarray(i), i_ref)
    assert int(np.asarray(i)[0, 0]) == target
    assert float(np.asarray(d)[0, 0]) > 1.0  # negative sim, not a pad


def test_int8_sharded_pad_rows_cannot_crowd_out_negative_sims():
    from semtools_tpu.ops.int8_scan import int8_topk_scan, quantize_global
    from semtools_tpu.parallel.scan import sharded_int8_topk_scan

    n_dev = 4
    mesh = corpus_mesh(n_dev)
    rng = np.random.default_rng(78)
    q = rng.standard_normal((1, 32)).astype(np.float32)
    q /= np.linalg.norm(q)
    n = 4 * 300 + 7
    e = -q + 0.05 * rng.standard_normal((n, 32)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    ortho = rng.standard_normal(32).astype(np.float32)
    ortho -= (ortho @ q[0]) * q[0]
    ortho /= np.linalg.norm(ortho)
    e[n - 1] = 0.999 * ortho - 0.045 * q[0]  # least-negative sim
    e[n - 1] /= np.linalg.norm(e[n - 1])
    e8, es = quantize_global(e)

    d_s, i_s = sharded_int8_topk_scan(q, e8, es, 3, mesh, interpret=True)
    d_1, i_1 = int8_topk_scan(q, e8, es, 3, interpret=True)
    np.testing.assert_array_equal(i_s, i_1)
    assert int(i_s[0, 0]) == n - 1


def test_int4_sharded_deep_candidates_match_single_device():
    """The sharded extraction's cutoff is the exact global k_cut-th-best
    biased sim (same computation as single-device), so the candidate SET
    must match int4_deep_candidates exactly — and contain the f32 top-10."""
    from semtools_tpu.ops.int4_scan import (
        int4_deep_candidates,
        quantize_pack_global,
    )
    from semtools_tpu.parallel.scan import sharded_int4_deep_candidates_device

    n_dev = 4
    mesh = corpus_mesh(n_dev)
    rng = np.random.default_rng(21)
    d = 64
    centers = rng.standard_normal((8, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = np.repeat(centers, 300, axis=0) + 0.08 * rng.standard_normal(
        (8 * 300, d)
    ).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    n = len(rows)
    p4, es = quantize_pack_global(rows)
    q = centers[:3]

    p4_sharded, _ = shard_corpus(p4, mesh)
    ids_s = sharded_int4_deep_candidates_device(
        q, p4_sharded, n, mesh, interpret=True
    )
    ids_1 = int4_deep_candidates(q, p4, interpret=True)

    from semtools_tpu.ops.scan import topk_scan

    _, i_exact = topk_scan(q, rows, 10)
    for r in range(3):
        got_s = set(int(x) for x in ids_s[r] if x < n)
        got_1 = set(int(x) for x in ids_1[r] if x < n)
        assert got_s == got_1, f"query {r}: sharded candidate set diverged"
        assert set(i_exact[r].tolist()) <= got_s


def test_int4_sharded_deep_candidates_masked():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semtools_tpu.ops.int4_scan import quantize_pack_global
    from semtools_tpu.parallel.mesh import SHARD_AXIS
    from semtools_tpu.parallel.scan import sharded_int4_deep_candidates_device

    n_dev = 4
    mesh = corpus_mesh(n_dev)
    rng = np.random.default_rng(22)
    d = 64
    rows = rng.standard_normal((1600, d)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    n = len(rows)
    p4, es = quantize_pack_global(rows)
    q = rows[:2] + 0.01

    p4_sharded, _ = shard_corpus(p4, mesh)
    mask_np = (rng.random(n) < 0.5).astype(np.int8)
    mask_np[:10] = 1
    mask_pad = np.concatenate(
        [mask_np, np.zeros(p4_sharded.shape[0] - n, np.int8)]
    )
    mask_dev = jax.device_put(
        mask_pad, NamedSharding(mesh, P(SHARD_AXIS))
    )
    ids = sharded_int4_deep_candidates_device(
        q, p4_sharded, n, mesh, mask=mask_dev, interpret=True
    )
    sims = rows @ q.T
    for r in range(2):
        got = [int(x) for x in ids[r] if x < n]
        assert got and all(mask_np[g] == 1 for g in got), "masked row leaked"
        s = sims[:, r].copy()
        s[mask_np == 0] = -np.inf
        exact = np.argsort(-s, kind="stable")[:10]
        assert set(exact.tolist()) <= set(got)
