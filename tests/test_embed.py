import numpy as np
import pytest

from semtools_tpu.ops.embed import (
    embed_token_lists,
    embed_token_lists_reference,
)


@pytest.fixture(scope="module")
def table(request):
    rng = np.random.Generator(np.random.Philox(7))
    return rng.standard_normal((512, 64), dtype=np.float32)


def test_embed_matches_numpy_reference(table):
    token_lists = [[1, 2, 3], [], [511], [5] * 100, list(range(200))]
    got = embed_token_lists(table, token_lists, normalize=True)
    want = embed_token_lists_reference(table, token_lists, normalize=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_embed_unnormalized(table):
    token_lists = [[4, 4, 4], [0, 1]]
    got = embed_token_lists(table, token_lists, normalize=False)
    want = embed_token_lists_reference(table, token_lists, normalize=False)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_empty_token_list_gives_zero_vector(table):
    got = embed_token_lists(table, [[]], normalize=True)
    assert got.shape == (1, 64)
    np.testing.assert_array_equal(got, np.zeros((1, 64), np.float32))


def test_normalized_rows_are_unit_or_zero(table):
    got = embed_token_lists(table, [[1], [2, 9], []], normalize=True)
    norms = np.linalg.norm(got, axis=1)
    np.testing.assert_allclose(norms[:2], 1.0, rtol=1e-5)
    assert norms[2] == 0.0


def test_batching_invariance(table):
    """Results must not depend on how lines are grouped into device calls."""
    token_lists = [[i % 512, (i * 7) % 512] for i in range(50)]
    together = embed_token_lists(table, token_lists)
    separate = np.concatenate(
        [embed_token_lists(table, [tl]) for tl in token_lists], axis=0
    )
    np.testing.assert_allclose(together, separate, rtol=1e-5, atol=1e-6)


def test_max_length_truncation(table):
    long_ids = list(range(300))
    short = embed_token_lists(table, [long_ids], max_length=10)
    manual = embed_token_lists_reference(table, [long_ids[:10]])
    np.testing.assert_allclose(short, manual, rtol=1e-5, atol=1e-6)


def test_device_call_chunking(table, monkeypatch):
    """Forcing tiny per-call budgets must not change results."""
    import semtools_tpu.ops.embed as embed_mod

    token_lists = [[i, i + 1, i + 2] for i in range(0, 60, 3)]
    want = embed_token_lists(table, token_lists)
    monkeypatch.setattr(embed_mod, "MAX_TOKENS_PER_CALL", 8)
    monkeypatch.setattr(embed_mod, "MAX_TEXTS_PER_CALL", 3)
    got = embed_mod.embed_token_lists(table, token_lists)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_zero_texts(table):
    got = embed_token_lists(table, [])
    assert got.shape == (0, 64)
