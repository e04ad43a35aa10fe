"""Mesh-sharded scan must agree with the single-device exact scan.

Runs on the 8-virtual-device CPU mesh (conftest forces
``xla_force_host_platform_device_count=8``).
"""

import jax
import numpy as np
import pytest

from semtools_tpu.ops.scan import topk_scan
from semtools_tpu.parallel import corpus_mesh, sharded_topk_scan


def _unit_rows(rng, n, d):
    m = rng.standard_normal((n, d)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_equals_exact(rng):
    q = _unit_rows(rng, 3, 32)
    e = _unit_rows(rng, 1000, 32)
    mesh = corpus_mesh()
    d_got, i_got = sharded_topk_scan(q, e, 10, mesh)
    d_want, i_want = topk_scan(q, e, 10)
    np.testing.assert_allclose(d_got, d_want, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i_got, i_want)


def test_sharded_with_ragged_padding(rng):
    # 1001 rows over 8 devices forces zero-row padding
    q = _unit_rows(rng, 2, 16)
    e = _unit_rows(rng, 1001, 16)
    d_got, i_got = sharded_topk_scan(q, e, 5, corpus_mesh())
    d_want, i_want = topk_scan(q, e, 5)
    np.testing.assert_allclose(d_got, d_want, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i_got, i_want)


def test_sharded_small_corpus(rng):
    # fewer rows than devices
    q = _unit_rows(rng, 1, 8)
    e = _unit_rows(rng, 3, 8)
    d, i = sharded_topk_scan(q, e, 5, corpus_mesh())
    assert set(i[0].tolist()) == {0, 1, 2}
    assert np.all(np.diff(d[0]) >= -1e-6)


def test_sharded_subset_mesh(rng):
    q = _unit_rows(rng, 1, 16)
    e = _unit_rows(rng, 64, 16)
    mesh = corpus_mesh(n_devices=4)
    d_got, i_got = sharded_topk_scan(q, e, 3, mesh)
    d_want, i_want = topk_scan(q, e, 3)
    np.testing.assert_allclose(d_got, d_want, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i_got, i_want)


def test_multihost_initialize_noop_on_single_host(monkeypatch):
    from semtools_tpu.parallel import multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert multihost.initialize() is False
    assert multihost.is_multihost_env() is False
