"""Batched Lloyd k-means on TPU.

Trains the IVF coarse quantizer and PQ sub-codebooks (BASELINE.json configs
4-5). One Lloyd step is two MXU matmuls plus segment reductions:

    assignment:  argmin_j ||x - c_j||^2 = argmax_j (x @ c_j - ||c_j||^2/2)
    update:      c_j <- mean of assigned x

The sharded variant is this framework's canonical *training step* — data
rows sharded over the mesh, per-device partial (sums, counts), ``psum``
over ICI, replicated centroid update. It is exercised multi-device by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from semtools_tpu.parallel.mesh import SHARD_AXIS

_PRECISION = jax.lax.Precision.HIGHEST


def _assign(x, centroids):
    """Nearest-centroid ids via the dot-product form (inputs f32)."""
    sims = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32, precision=_PRECISION)
    norms = 0.5 * jnp.sum(centroids * centroids, axis=1)
    return jnp.argmax(sims - norms[None, :], axis=1)


def _partial_sums(x, assign, k: int):
    sums = jax.ops.segment_sum(x, assign, num_segments=k)
    counts = jax.ops.segment_sum(jnp.ones(x.shape[0], jnp.float32), assign, num_segments=k)
    return sums, counts


@functools.partial(jax.jit, static_argnames=("k",))
def kmeans_step(x, centroids, *, k: int):
    """One Lloyd iteration. Empty clusters keep their previous centroid."""
    assign = _assign(x, centroids)
    sums, counts = _partial_sums(x, assign, k)
    new = sums / jnp.maximum(counts, 1.0)[:, None]
    new = jnp.where(counts[:, None] > 0, new, centroids)
    return new, assign


def make_sharded_kmeans_step(mesh: Mesh, k: int, axis: str = SHARD_AXIS):
    """Data-parallel Lloyd step: x row-sharded, centroids replicated."""

    def local_step(x_local, centroids):
        assign = _assign(x_local, centroids)
        sums, counts = _partial_sums(x_local, assign, k)
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        new = jnp.where(counts[:, None] > 0, new, centroids)
        return new, assign

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None)),
        out_specs=(P(None, None), P(axis,)),
        check_vma=False,
    )
    return jax.jit(fn)


# Backwards-friendly alias used by the package __init__.
sharded_kmeans_step = make_sharded_kmeans_step


def kmeans_fit(
    x: np.ndarray,
    k: int,
    iters: int = 10,
    seed: int = 0,
    mesh: Optional[Mesh] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fit k centroids; returns (centroids [k, D], assignments [N]).

    Init: distinct random data points (enough for IVF/PQ purposes — Lloyd
    refines from there; k-means++ would add host-side serial passes).
    """
    n = x.shape[0]
    k = min(k, n)
    rng = np.random.Generator(np.random.Philox(seed))
    init_idx = rng.choice(n, size=k, replace=False)
    centroids = jnp.asarray(x[init_idx], jnp.float32)
    xj = jnp.asarray(x, jnp.float32)

    if mesh is not None:
        n_dev = int(mesh.devices.size)
        pad = (-n) % n_dev
        if pad:
            # Pad with copies of the first row; dedup via weights would be
            # overkill for quantizer training.
            xj = jnp.concatenate([xj, jnp.tile(xj[:1], (pad, 1))], axis=0)
        step = make_sharded_kmeans_step(mesh, k)
        assign = None
        for _ in range(iters):
            centroids, assign = step(xj, centroids)
        return np.asarray(centroids), np.asarray(assign)[:n]

    # Single-device path: the whole Lloyd loop runs as ONE jitted
    # dispatch — eager per-op execution of the [N, k] similarity
    # intermediates was the entire build cost on dispatch-latency hosts.
    centroids, assign = _fit_loop(xj, centroids, k=k, iters=iters)
    return np.asarray(centroids), np.asarray(assign)[:n]


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _fit_loop(xj, centroids, *, k: int, iters: int):
    def body(_, c):
        new, _assignments = kmeans_step(xj, c, k=k)
        return new

    centroids = jax.lax.fori_loop(0, iters, body, centroids)
    return centroids, _assign(xj, centroids)
