"""Seeded property tests: randomized equivalence and invariants.

Deterministic (fixed seeds), fast, and CPU-only — they fuzz the seams the
unit tests pin individually: pallas-vs-XLA selection across random shapes,
store upsert/delete/search invariants under random operation sequences,
and threshold-vs-topk consistency.
"""

from __future__ import annotations

import numpy as np
import pytest

from semtools_tpu.ops.pallas_scan import pallas_topk_scan
from semtools_tpu.ops.scan import threshold_scan, topk_scan


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.where(norms > 0, norms, 1.0)


@pytest.mark.parametrize("seed", range(6))
def test_pallas_matches_xla_random_shapes(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 6000))
    d = int(rng.choice([16, 64, 256]))
    k = int(rng.integers(1, 12))
    qn = int(rng.integers(1, 5))
    e = _unit(rng, n, d)
    if rng.random() < 0.3 and n > 3:
        e[rng.integers(0, n)] = 0.0  # zero row (empty line)
    q = _unit(rng, qn, d)
    d_ref, i_ref = topk_scan(q, e, k)
    d_pal, i_pal = pallas_topk_scan(q, e, k, interpret=True)
    np.testing.assert_array_equal(i_pal, i_ref)
    np.testing.assert_allclose(d_pal, d_ref, atol=1e-5)


@pytest.mark.parametrize("seed", range(4))
def test_threshold_consistent_with_topk(seed):
    # every threshold hit with rank < k must appear in the top-k, in order
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(10, 3000))
    e = _unit(rng, n, 32)
    q = _unit(rng, 1, 32)
    t = float(rng.uniform(0.5, 1.2))
    k = 8
    d_th, i_th = threshold_scan(q, e, t)
    d_tk, i_tk = topk_scan(q, e, k)
    m = min(len(i_th), min(k, n))
    np.testing.assert_array_equal(i_th[:m], i_tk[0][:m])
    assert np.all(np.diff(d_th) >= -1e-7)
    assert np.all(d_th < t)


@pytest.mark.parametrize("seed", range(3))
def test_store_random_operation_sequences(tmp_path, seed):
    """Random upserts/deletes/searches keep the store consistent with a
    plain dict-of-matrices reference model."""
    from semtools_tpu.store.store import Store

    rng = np.random.default_rng(300 + seed)
    s = Store(str(tmp_path / f"fz{seed}"), dim=16)
    model = {}  # path -> matrix
    paths = [f"/doc{i}.txt" for i in range(6)]

    for step in range(25):
        op = rng.random()
        p = paths[int(rng.integers(0, len(paths)))]
        if op < 0.55:  # upsert (new or replace, random length)
            m = _unit(rng, int(rng.integers(1, 30)), 16)
            s.upsert_document_lines(p, m)
            model[p] = m
        elif op < 0.75 and model:  # delete an existing doc
            victim = list(model)[int(rng.integers(0, len(model)))]
            s.delete_line_embeddings([victim])
            del model[victim]
        else:  # search and check against the reference model
            if not model:
                continue
            all_rows = np.concatenate([model[k2] for k2 in sorted(model)], axis=0)
            owner = []
            for k2 in sorted(model):
                owner += [(k2, i) for i in range(len(model[k2]))]
            q = _unit(rng, 1, 16)[0]
            got = s.search_line_embeddings(q, sorted(model), top_k=3)
            sims = all_rows @ q
            expect_order = np.argsort(1.0 - sims, kind="stable")[:3]
            expect = [(owner[j][0], owner[j][1]) for j in expect_order]
            assert [(rl.path, rl.line_number) for rl in got] == expect, (
                step, got, expect)
        # invariant: line count matches the model
        assert s.count_line_embeddings() == sum(len(m2) for m2 in model.values())
    s.close()


@pytest.mark.parametrize("seed", range(3))
def test_int8_selection_exact_over_quantized_random(seed):
    from semtools_tpu.ops.int8_scan import int8_topk_scan, quantize_global

    rng = np.random.default_rng(400 + seed)
    n = int(rng.integers(5, 4000))
    e = _unit(rng, n, 64)
    e8, es = quantize_global(e)
    q = _unit(rng, int(rng.integers(1, 4)), 64)
    q8, qs = quantize_global(q)
    k = min(int(rng.integers(1, 8)), n)
    d_q, i_q = int8_topk_scan(q, e8, es, k, interpret=True)
    int_sims = q8.astype(np.int64) @ e8.astype(np.int64).T
    for qi in range(q.shape[0]):
        expect = np.argsort(-int_sims[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i_q[qi], expect)


@pytest.mark.parametrize(
    "tier_env",
    [
        {"SEMTOOLS_TPU_STORE_INT8": "1"},
        {"SEMTOOLS_TPU_SHARDED": "1"},
        {"SEMTOOLS_TPU_SHARDED": "1", "SEMTOOLS_TPU_STORE_INT8": "1"},
        {"SEMTOOLS_TPU_REDUCED_DIM": "8",
         "SEMTOOLS_TPU_DEVICE_CACHE_BYTES": "4000"},
        {"SEMTOOLS_TPU_SCAN": "host"},
    ],
)
def test_store_random_sequences_all_tiers(tmp_path, monkeypatch, tier_env):
    """The random op-sequence fuzz, repeated under every serving tier:
    int8 (exact rerank), mesh-sharded, sharded+int8, and the PCA-reduced
    capacity tier — results must match the brute-force reference model
    regardless of which device path serves (patching included)."""
    from semtools_tpu.store import device_cache
    from semtools_tpu.store.store import Store

    for k, v in tier_env.items():
        monkeypatch.setenv(k, v)
    device_cache.invalidate()

    rng = np.random.default_rng(4242)
    s = Store(str(tmp_path / "fz_tier"), dim=16)
    model = {}
    hash_model = {}
    paths = [f"/doc{i}.txt" for i in range(6)]

    for step in range(25):
        op = rng.random()
        p = paths[int(rng.integers(0, len(paths)))]
        if op < 0.55:
            m = _unit(rng, int(rng.integers(1, 30)), 16)
            # degenerate shapes the soak found productive: zero rows
            # (empty lines) and duplicates (ties)
            for i in range(len(m)):
                r2 = rng.random()
                if r2 < 0.08:
                    m[i] = 0.0
                elif r2 < 0.2 and i > 0:
                    m[i] = m[int(rng.integers(0, i))]
            hashes = (rng.integers(1, 1 << 62, len(m))).astype(np.uint64)
            s.upsert_document_lines(p, m, hashes)
            model[p] = m
            hash_model[p] = hashes
        elif op < 0.75 and model:
            victim = list(model)[int(rng.integers(0, len(model)))]
            s.delete_line_embeddings([victim])
            del model[victim]
            hash_model.pop(victim, None)
        else:
            if not model:
                continue
            all_rows = np.concatenate([model[k2] for k2 in sorted(model)], axis=0)
            owner = []
            for k2 in sorted(model):
                owner += [(k2, i) for i in range(len(model[k2]))]
            q = _unit(rng, 1, 16)[0]
            got = s.search_line_embeddings(q, sorted(model), top_k=3)
            sims = all_rows @ q
            expect_order = np.argsort(1.0 - sims, kind="stable")[:3]
            expect = [(owner[j][0], owner[j][1]) for j in expect_order]
            assert [(rl.path, rl.line_number) for rl in got] == expect, (
                step, tier_env, got, expect)
            # hash sidecar stays consistent under allocator churn
            probe = list(model)[int(rng.integers(0, len(model)))]
            hr = s.get_doc_hash_rows(probe)
            assert hr is not None
            np.testing.assert_array_equal(hr[0], hash_model[probe])
            np.testing.assert_allclose(hr[1], model[probe], atol=1e-6)
            # batched serving must agree with brute force under the same
            # mutation history and tier (first row = the single query)
            qs = np.concatenate([q[None], _unit(rng, 2, 16)], axis=0)
            per = s.search_line_embeddings_batched(qs, sorted(model), 3)
            for row, rows in enumerate(per):
                sims_r = all_rows @ qs[row]
                order_r = np.argsort(1.0 - sims_r, kind="stable")[:3]
                expect_r = [(owner[j][0], owner[j][1]) for j in order_r]
                assert [(rl.path, rl.line_number) for rl in rows] == expect_r, (
                    step, tier_env, row, rows, expect_r)
        assert s.count_line_embeddings() == sum(len(m2) for m2 in model.values())
    s.close()
    device_cache.invalidate()
