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


@jax.jit
def _fused_assign_encode(chunk, centroids, c_norm_half, codebooks,
                         cb_norm_half):
    """One-dispatch build step: ``chunk`` [B, D] f32 ->
    (assign [B] int32, codes [B, M] uint8).

    Coarse assignment (argmax x.c - |c|^2/2), residual against the
    assigned centroid, and per-subspace PQ encoding of that residual —
    the same math as kmeans._assign + pq._encode run separately, at the
    same HIGHEST matmul precision, fused so the corpus crosses the
    host->device link exactly once per build."""
    sims = jnp.dot(chunk, centroids.T, preferred_element_type=jnp.float32,
                   precision=_PRECISION)
    a = jnp.argmax(sims - c_norm_half[None, :], axis=1)
    res = chunk - centroids[a]
    resh = res.reshape(res.shape[0], codebooks.shape[0], codebooks.shape[2])
    s2 = jnp.einsum("nmd,mkd->nmk", resh, codebooks, precision=_PRECISION)
    codes = jnp.argmax(s2 - cb_norm_half[None], axis=2).astype(jnp.uint8)
    return a.astype(jnp.int32), codes


def _drain_fused(pending, assign, codes, n: int, chunk_rows: int) -> None:
    """Read back one fused chunk's (assign, codes), trimming the zero
    padding of the final chunk."""
    start, (a_dev, c_dev) = pending
    stop = min(start + chunk_rows, n)
    assign[start:stop] = np.asarray(a_dev)[: stop - start]
    codes[start:stop] = np.asarray(c_dev)[: stop - start]


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
        progress=None,
    ) -> "IvfPqIndex":
        """``progress``: optional ``callable(str)`` invoked at phase
        boundaries and ~10% steps of the chunked full-corpus passes — a
        10M-row build runs for tens of minutes (2,515 s measured on one
        CPU core, bench_ann_scale) and silence reads as a hang."""

        def _report(msg: str) -> None:
            if progress is not None:
                progress(msg)

        n = x.shape[0]
        nlist = max(1, min(nlist, n))
        # Train quantizers on a sample (the FAISS convention): k-means and
        # PQ codebooks converge on ~64 points/centroid; training on all
        # rows made a 500k-row build take minutes for no recall gain. The
        # full corpus still gets one exact assignment + encode pass below.
        # The sample SCALES with nlist (pow2 so the Lloyd-loop executable
        # shapes stay shared across similarly-sized corpora): the old
        # fixed 2^17 cap starved nlist=4096 at 31 points/centroid — under
        # FAISS's ~39 warning floor — and measured candidate recall@10
        # sagged 1.0 -> 0.87 between 1M and 10M rows (bench_ann_scale).
        # 64 points/centroid restores it without touching probe depth.
        train_rows = min(n, max(1 << 17, 64 * nlist))
        train_rows = min(n, 1 << (train_rows - 1).bit_length())
        if train_rows < n:
            rng = np.random.default_rng(seed)
            sample = np.asarray(x[np.sort(rng.choice(n, train_rows, replace=False))])
        else:
            sample = np.asarray(x)
        _report(f"training coarse quantizer ({nlist} lists, {train_rows} sample rows)")
        centroids, _ = kmeans_fit(sample, nlist, iters=train_iters, seed=seed, mesh=mesh)
        import jax as _jax
        import jax.numpy as _jnp

        from semtools_tpu.index.kmeans import _assign

        assign_jit = _jax.jit(_assign)
        cj = _jnp.asarray(centroids)  # upload once, not per chunk
        # Chunk so the [chunk, nlist] sims intermediate stays ~128 MB
        # regardless of nlist (a fixed 1M-row chunk at nlist=4096 would
        # materialize 16 GB and OOM the chip). ``x`` may be an mmap:
        # only one chunk is ever resident.
        chunk_rows = max(8192, (1 << 25) // max(nlist, 1))
        # RESIDUAL PQ (classic IVFADC): quantize x - centroid[assign], not
        # x. On clustered data the raw vectors' variance is dominated by
        # the cluster centers, so raw-vector PQ wastes its dynamic range
        # re-encoding what the coarse quantizer already knows and cannot
        # rank within a cluster (measured recall@10 collapse 0.94 -> 0.14
        # as corpus density grows). Residuals concentrate the codebook on
        # within-list differences. With inner-product scoring the ADC
        # stays a single shared table because
        #   q . x = q . c_list + q . residual
        # — the first term is the coarse similarity, the second the
        # residual table sum; no per-list tables needed.
        #
        # Residuals are never materialized corpus-wide: the PQ trains on a
        # sampled-residual matrix and every row is encoded CHUNKED below,
        # so peak extra memory is O(chunk + codes), not O(n x D) — at 10M
        # rows the old full-residual copy alone was 10 GB.
        # PQ trains on a SAMPLE of residuals, which only needs the
        # sample's own assignments — assigning the full corpus up front
        # (the pre-r5 shape) cost a whole extra streamed pass over x.
        pq_train_rows = min(n, 65_536)
        if pq_train_rows < n:
            rng_pq = np.random.default_rng(seed + 7)
            sel = np.sort(rng_pq.choice(n, pq_train_rows, replace=False))
            srows = np.asarray(x[sel], np.float32)
        else:
            srows = np.asarray(x, np.float32)
        s_assign = np.empty(srows.shape[0], np.int64)
        for start in range(0, srows.shape[0], chunk_rows):
            s_assign[start:start + chunk_rows] = np.asarray(
                assign_jit(_jnp.asarray(srows[start:start + chunk_rows]), cj)
            )
        pq_train = srows - centroids[s_assign]
        del srows, s_assign
        _report(f"training PQ codebooks (m={m}, {pq_train.shape[0]} residual rows)")
        pq = pq_fit(pq_train, m=m, iters=max(4, train_iters // 2), seed=seed + 1)

        # ONE fused streamed pass over the corpus: each chunk crosses the
        # link once and a single dispatch computes coarse assignment,
        # residual, and PQ codes on the accelerator; only [chunk] ids +
        # [chunk, m] codes come back down (m bytes/row vs 4*D up). This
        # replaced the assign-pass + host-residual + encode-pass shape
        # whose full-corpus matmuls bound the 10M-row build to the host
        # (2,123 s measured; the link crossing is the only real cost on
        # a healthy device path). Chunks are zero-padded to one shape so
        # the loop shares a single executable, and the NEXT chunk is
        # device_put before the current results are read back so the
        # upload overlaps compute + readback (double buffering).
        assign = np.empty(n, np.int64)
        codes = np.empty((n, m), np.uint8)
        _report(f"assigning + encoding {n} rows (fused device pass)")
        report_every = max(1, ((n + chunk_rows - 1) // chunk_rows) // 10)
        books_j = _jnp.asarray(pq.codebooks)
        cb_norm_half = 0.5 * _jnp.sum(books_j * books_j, axis=2)
        c_norm_half = 0.5 * _jnp.sum(cj * cj, axis=1)

        def _staged(start: int):
            blk = np.asarray(x[start:start + chunk_rows], np.float32)
            if blk.shape[0] < chunk_rows:
                blk = np.concatenate([
                    blk,
                    np.zeros((chunk_rows - blk.shape[0], blk.shape[1]),
                             np.float32),
                ])
            return _jax.device_put(blk)

        starts = list(range(0, n, chunk_rows))
        pending = None  # (start, (assign_dev, codes_dev))
        staged = _staged(starts[0]) if starts else None
        for ci, start in enumerate(starts):
            out = _fused_assign_encode(
                staged, cj, c_norm_half, books_j, cb_norm_half
            )
            staged = _staged(starts[ci + 1]) if ci + 1 < len(starts) else None
            if pending is not None:
                _drain_fused(pending, assign, codes, n, chunk_rows)
            pending = (start, out)
            if ci % report_every == report_every - 1:
                _report(f"  processed {min(start + chunk_rows, n)}/{n}")
        if pending is not None:
            _drain_fused(pending, assign, codes, n, chunk_rows)

        perm = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=nlist)
        offsets = np.zeros(nlist + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        codes = np.ascontiguousarray(codes[perm])
        _report("finalizing (list permutation + publish)")
        vectors = np.ascontiguousarray(np.asarray(x)[perm], dtype=np.float32) if keep_vectors else None
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
        rerank: int = 16,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (distances, original indices) for each query row.

        ``rerank`` is the oversampling factor: rerank*k ADC candidates are
        re-scored exactly when original vectors are kept. Measured on
        clustered 100k x 256 data (residual PQ, m=32): recall@10 is 0.78
        at rerank=4, 0.93 at 8, 0.996 at 16 — and exact re-rank of
        16*k rows is negligible next to the probe itself.
        """
        q = np.asarray(q, np.float32)
        if q.ndim == 1:
            q = q[None]
        nprobe = min(nprobe, self.nlist)
        k = min(k, self.n)
        if k == 0:
            return np.zeros((q.shape[0], 0), np.float32), np.zeros((q.shape[0], 0), np.int64)

        # Coarse probe: nearest lists by dot - |c|^2/2 (L2-to-centroid
        # ordering); the plain dot q.c is kept for the residual ADC offset.
        coarse_dot = q @ self.centroids.T  # [Q, nlist]
        sims = coarse_dot - 0.5 * np.sum(self.centroids**2, axis=1)[None]
        probe_lists = np.argsort(-sims, axis=1)[:, :nprobe]  # [Q, nprobe]

        tables = np.ascontiguousarray(
            adc_tables(jnp.asarray(q), jnp.asarray(self.pq.codebooks)),
            dtype=np.float32,
        )  # [Q, M, 256]

        out_d = np.zeros((q.shape[0], k), np.float32)
        out_i = np.zeros((q.shape[0], k), np.int64)
        n_cand = max(k * max(1, rerank), k)

        for qi in range(q.shape[0]):
            rows, approx = self._probe(
                probe_lists[qi], coarse_dot[qi], tables[qi]
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

    def _probe(
        self, lists: np.ndarray, coarse_row: np.ndarray, table: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """ADC-scan the probed lists for ONE query.

        Returns (rows, approx): absolute row indices into the permuted
        code matrix and their approximate similarities
        ``q . c_list + sum_m table[m, code_m]`` (residual decomposition).

        The hot path is the native kernel (cpp/adcscan.cpp): it walks the
        lists' contiguous code slices in place — no candidate gather, no
        index-dtype copies — measured 14 ms vs 325 ms numpy for the 625k
        x 64 probe a 10M-row store issues per query (the ANN tier's q/s
        lever, RESULTS_TPU ann_scale). The numpy path is the portable
        fallback and the equivalence oracle (tests/test_index.py).
        """
        starts = np.ascontiguousarray(self.list_offsets[lists])
        ends = np.ascontiguousarray(self.list_offsets[lists + 1])
        total = int(np.sum(ends - starts))
        if total == 0:
            # Degenerate probe (all probed lists empty): fall back to the
            # whole corpus so small/skewed indexes still answer.
            rows = np.arange(self.n)
            row_lists = np.searchsorted(self.list_offsets, rows, side="right") - 1
            offsets_qc = coarse_row[row_lists]
            return rows, offsets_qc + self._adc_sum_numpy(self.codes, table)

        lib = None
        if self.codes.flags.c_contiguous and self.codes.dtype == np.uint8:
            from semtools_tpu.utils import native

            lib = native.adc_lib()
        if lib is not None:
            import ctypes

            bias = np.ascontiguousarray(coarse_row[lists], np.float32)
            scores = np.empty(total, np.float32)
            rows = np.empty(total, np.int64)
            written = lib.adc_scan_lists(
                self.codes.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_longlong(self.pq.m),
                table.ctypes.data_as(ctypes.c_void_p),
                starts.ctypes.data_as(ctypes.c_void_p),
                ends.ctypes.data_as(ctypes.c_void_p),
                bias.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_longlong(len(lists)),
                scores.ctypes.data_as(ctypes.c_void_p),
                rows.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_longlong(total),
            )
            assert written == total, (written, total)
            return rows, scores

        blocks = [np.arange(s, e) for s, e in zip(starts, ends)]
        rows = np.concatenate(blocks)
        offsets_qc = np.repeat(coarse_row[lists], [len(b) for b in blocks])
        return rows, offsets_qc + self._adc_sum_numpy(self.codes[rows], table)

    @staticmethod
    def _adc_sum_numpy(cand_codes: np.ndarray, table: np.ndarray) -> np.ndarray:
        """Sum of per-subquantizer table entries, one pass per subspace:
        each pass gathers from a 1 KB (L1-resident) table row — ~1.8x the
        single fancy-indexed [pool, M] gather, and no [pool, M] int64
        index copy."""
        m = table.shape[0]
        c_t = np.ascontiguousarray(cand_codes.T)
        acc = np.take(table[0], c_t[0]).astype(np.float32, copy=True)
        for j in range(1, m):
            acc += np.take(table[j], c_t[j])
        return acc

    # -- incremental updates -------------------------------------------------

    def encode_rows(self, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(list ids, residual PQ codes) for NEW rows under the frozen
        quantizers — the incremental-update path (a mutation appends a
        delta segment instead of staling the whole index; the store's
        reconcile uses this). Host numpy: deltas are small by the drift
        bound, and the caller may be on a degraded link.
        """
        x = np.asarray(x, np.float32)
        if x.shape[0] == 0:
            return np.zeros(0, np.int64), np.zeros((0, self.pq.m), np.uint8)
        sims = x @ self.centroids.T - 0.5 * np.sum(self.centroids**2, axis=1)[None]
        assign = np.argmax(sims, axis=1)
        codes = pq_encode(x - self.centroids[assign], self.pq)
        return assign.astype(np.int64), codes

    def score_rows(
        self, q: np.ndarray, codes: np.ndarray, list_ids: np.ndarray
    ) -> np.ndarray:
        """[Q, M_rows] approximate similarities of delta rows: the coarse
        term q . c_list plus the residual ADC table sum — the same
        decomposition the probe uses, so delta and main candidates are
        comparable."""
        q = np.asarray(q, np.float32)
        if codes.shape[0] == 0:
            return np.zeros((q.shape[0], 0), np.float32)
        tables = np.asarray(
            adc_tables(jnp.asarray(q), jnp.asarray(self.pq.codebooks))
        )  # [Q, M, 256]
        coarse = q @ self.centroids.T  # [Q, C]
        m_idx = np.arange(self.pq.m)[None, :]
        codes64 = codes.astype(np.int64)
        resid = np.stack([t[m_idx, codes64].sum(axis=1) for t in tables])
        return coarse[:, list_ids] + resid

    # -- persistence --------------------------------------------------------

    def save(self, path: str, extra: Optional[dict] = None) -> None:
        """``extra`` lets the caller embed pairing metadata (e.g. a build
        token shared with a sidecar file) — ignored by :meth:`load`."""
        np.savez_compressed(
            path,
            centroids=self.centroids,
            codebooks=self.pq.codebooks,
            codes=self.codes,
            perm=self.perm,
            list_offsets=self.list_offsets,
            vectors=self.vectors if self.vectors is not None else np.zeros((0, 0), np.float32),
            **(extra or {}),
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
