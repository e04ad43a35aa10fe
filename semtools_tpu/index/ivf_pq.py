"""IVF-PQ index: coarse inverted lists + PQ codes + exact re-ranking.

The workspace's fast index tier for large corpora (BASELINE.json configs
4-5; the reference's qdrant-edge shard served the equivalent ANN role,
src/workspace/store.rs:443). Structure:

- a coarse k-means quantizer of C centroids partitions vectors into
  inverted lists, stored *contiguously per list* (one permutation array),
  so probing a list is a slice, not a gather;
- each vector is PQ-encoded to M bytes; a query ADC-scans only the
  ``nprobe`` nearest lists;
- optional exact re-rank of the top oversampled candidates against the
  original f32 vectors recovers brute-force-quality ordering at the top.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from semtools_tpu.index.kmeans import kmeans_fit
from semtools_tpu.index.pq import PQCodebook, adc_tables, pq_encode, pq_fit

_PRECISION = jax.lax.Precision.HIGHEST


@dataclass
class IvfPqIndex:
    centroids: np.ndarray  # [C, D]
    pq: PQCodebook
    codes: np.ndarray  # [N, M] uint8, permuted into list order
    perm: np.ndarray  # [N] original index per permuted row
    list_offsets: np.ndarray  # [C + 1] slice bounds into codes/perm
    vectors: Optional[np.ndarray] = None  # [N, D] original rows (list order) for re-rank

    @property
    def n(self) -> int:
        return self.codes.shape[0]

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    # -- build -------------------------------------------------------------

    @classmethod
    def build(
        cls,
        x: np.ndarray,
        nlist: int = 256,
        m: int = 32,
        train_iters: int = 10,
        seed: int = 0,
        keep_vectors: bool = True,
        mesh=None,
    ) -> "IvfPqIndex":
        n = x.shape[0]
        nlist = max(1, min(nlist, n))
        centroids, assign = kmeans_fit(x, nlist, iters=train_iters, seed=seed, mesh=mesh)
        # Residual-free PQ (IVFADC without residuals): for cosine/IP search
        # over unit vectors, encoding raw vectors keeps the ADC a pure dot
        # table and lets one codebook serve all lists.
        pq = pq_fit(x, m=m, iters=max(4, train_iters // 2), seed=seed + 1)

        perm = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=nlist)
        offsets = np.zeros(nlist + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])

        codes = pq_encode(np.ascontiguousarray(x[perm]), pq)
        vectors = np.ascontiguousarray(x[perm], dtype=np.float32) if keep_vectors else None
        return cls(
            centroids=centroids.astype(np.float32),
            pq=pq,
            codes=codes,
            perm=perm.astype(np.int64),
            list_offsets=offsets,
            vectors=vectors,
        )

    # -- query -------------------------------------------------------------

    def search(
        self,
        q: np.ndarray,
        k: int,
        nprobe: int = 8,
        rerank: int = 4,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (distances, original indices) for each query row.

        ``rerank`` is the oversampling factor: rerank*k ADC candidates are
        re-scored exactly when original vectors are kept.
        """
        q = np.asarray(q, np.float32)
        if q.ndim == 1:
            q = q[None]
        nprobe = min(nprobe, self.nlist)
        k = min(k, self.n)
        if k == 0:
            return np.zeros((q.shape[0], 0), np.float32), np.zeros((q.shape[0], 0), np.int64)

        # Coarse probe: nearest lists by dot - |c|^2/2.
        sims = q @ self.centroids.T - 0.5 * np.sum(self.centroids**2, axis=1)[None]
        probe_lists = np.argsort(-sims, axis=1)[:, :nprobe]  # [Q, nprobe]

        tables = np.asarray(
            adc_tables(jnp.asarray(q), jnp.asarray(self.pq.codebooks))
        )  # [Q, M, 256]

        out_d = np.zeros((q.shape[0], k), np.float32)
        out_i = np.zeros((q.shape[0], k), np.int64)
        n_cand = max(k * max(1, rerank), k)

        for qi in range(q.shape[0]):
            rows = np.concatenate(
                [
                    np.arange(self.list_offsets[l], self.list_offsets[l + 1])
                    for l in probe_lists[qi]
                ]
            )
            if rows.size == 0:
                rows = np.arange(self.n)
            cand_codes = self.codes[rows]  # [M_cand, M]
            # ADC: sims = sum_m tables[qi, m, code]
            approx = tables[qi][np.arange(self.pq.m)[None, :], cand_codes.astype(np.int64)].sum(
                axis=1
            )
            take = min(n_cand, rows.size)
            top = np.argpartition(-approx, take - 1)[:take]

            if self.vectors is not None:
                exact = q[qi] @ self.vectors[rows[top]].T
                order = np.argsort(-exact, kind="stable")[:k]
                sel = top[order]
                out_d[qi, : len(sel)] = 1.0 - exact[order]
            else:
                order = np.argsort(-approx[top], kind="stable")[:k]
                sel = top[order]
                out_d[qi, : len(sel)] = 1.0 - approx[top][order]
            out_i[qi, : len(sel)] = self.perm[rows[sel]]
            if len(sel) < k:
                out_d[qi, len(sel):] = np.inf
                out_i[qi, len(sel):] = -1
        return out_d, out_i

    # -- persistence --------------------------------------------------------

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            centroids=self.centroids,
            codebooks=self.pq.codebooks,
            codes=self.codes,
            perm=self.perm,
            list_offsets=self.list_offsets,
            vectors=self.vectors if self.vectors is not None else np.zeros((0, 0), np.float32),
        )

    @classmethod
    def load(cls, path: str) -> "IvfPqIndex":
        z = np.load(path)
        vectors = z["vectors"]
        return cls(
            centroids=z["centroids"],
            pq=PQCodebook(z["codebooks"]),
            codes=z["codes"],
            perm=z["perm"],
            list_offsets=z["list_offsets"],
            vectors=vectors if vectors.size else None,
        )
