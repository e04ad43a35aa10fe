"""Product quantization: codebook fit, encoding, and ADC scans.

Compresses D-dim f32 vectors to M bytes (M subspaces x 256 centroids each),
cutting the HBM traffic of a scan by 4*D/M (32x for D=256, M=32) — the
lever behind the ">=1M chunk vectors/ms/chip" BASELINE target. Querying
uses asymmetric distance computation (ADC): per query, an [M, 256] table of
partial dot products against the codebooks, then a code-indexed gather-sum.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


import jax
import jax.numpy as jnp
import numpy as np

from semtools_tpu.index.kmeans import kmeans_fit

_PRECISION = jax.lax.Precision.HIGHEST


@dataclass
class PQCodebook:
    """codebooks: [M, 256, dsub] float32 — M subspaces over D = M*dsub."""

    codebooks: np.ndarray

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.dsub


def pq_fit(
    x: np.ndarray, m: int = 32, ksub: int = 256, iters: int = 8, seed: int = 0
) -> PQCodebook:
    """Fit per-subspace codebooks with k-means."""
    n, d = x.shape
    assert d % m == 0, f"dim {d} not divisible by {m} subspaces"
    dsub = d // m
    ksub = min(ksub, n)
    books = np.zeros((m, ksub, dsub), np.float32)
    for j in range(m):
        sub = np.ascontiguousarray(x[:, j * dsub : (j + 1) * dsub])
        books[j], _ = kmeans_fit(sub, ksub, iters=iters, seed=seed + j)
    if ksub < 256:
        # Keep the table layout fixed at 256 rows so scans have one shape.
        pad = np.repeat(books[:, :1], 256 - ksub, axis=1)
        books = np.concatenate([books, pad], axis=1)
    return PQCodebook(books)


@jax.jit
def _encode(x_resh, codebooks):
    """x_resh: [N, M, dsub]; codebooks: [M, 256, dsub] -> codes [N, M] uint8."""
    # Nearest sub-centroid per subspace: argmax x.c - |c|^2/2 over 256.
    sims = jnp.einsum(
        "nmd,mkd->nmk", x_resh, codebooks, precision=_PRECISION
    )
    norms = 0.5 * jnp.sum(codebooks * codebooks, axis=2)  # [M, 256]
    return jnp.argmax(sims - norms[None], axis=2).astype(jnp.uint8)


def pq_encode(x: np.ndarray, pq: PQCodebook) -> np.ndarray:
    n, d = x.shape
    x_resh = x.reshape(n, pq.m, pq.dsub)
    return np.asarray(_encode(jnp.asarray(x_resh), jnp.asarray(pq.codebooks)))


@jax.jit
def adc_tables(q, codebooks):
    """Per-query partial-dot tables: q [Q, D] -> [Q, M, 256]."""
    qm = q.reshape(q.shape[0], codebooks.shape[0], -1)  # [Q, M, dsub]
    return jnp.einsum("qmd,mkd->qmk", qm, codebooks, precision=_PRECISION)


@jax.jit
def _adc_scan(tables, codes):
    """tables [Q, M, 256] x codes [N, M] -> approx sims [Q, N].

    The inner op is a code-indexed gather over the last axis; XLA lowers
    take_along_axis into a vectorized dynamic-gather on TPU.
    """
    # gathered[q, n, m] = tables[q, m, codes[n, m]]: expand tables to
    # [Q, 1, M, 256] and codes to [1, N, M, 1], gather on the last axis.
    gathered = jnp.take_along_axis(
        tables[:, None],  # [Q, 1, M, 256]
        codes[None, :, :, None].astype(jnp.int32),  # [1, N, M, 1]
        axis=3,
    )  # [Q, N, M, 1]
    return jnp.sum(gathered[..., 0], axis=2)


def adc_scan(
    q: np.ndarray, codes: np.ndarray, pq: PQCodebook, k: Optional[int] = None
):
    """Approximate top-k by ADC. Returns (distances [Q, k], indices [Q, k])
    with distance = 1 - approx_sim (same scale as the exact scan)."""
    tables = adc_tables(jnp.asarray(q, jnp.float32), jnp.asarray(pq.codebooks))
    sims = _adc_scan(tables, jnp.asarray(codes))
    if k is None:
        return np.asarray(1.0 - sims)
    k = min(k, codes.shape[0])
    vals, idx = jax.lax.top_k(sims, k)
    return np.asarray(1.0 - vals), np.asarray(idx)
