"""IVF-PQ capacity tier at its SERVING scale (>= 10M rows).

The round-2 review noted every committed ANN number sat at 200k rows —
two orders of magnitude below the corpus sizes the tier actually serves
(it only kicks in when even reduced-int8 exceeds the device budget,
>= ~16-67M rows at the default 4 GiB). This bench builds and queries the
index at 10M+ rows with the STORE's exact parameters (pow2 nlist capped
at 4096, m=32, residual PQ, nprobe = nlist/16, 64x-k candidate depth,
exact re-rank — store.py _search_ann_batched / build_ann_index) and
measures:

- build seconds (the degraded-link CPU-pinned path this host forces;
  a co-located TPU runs the same math through the device backend);
- recall@10 of the 64x-k probe + exact re-rank vs brute force;
- candidate recall (true top-10 coverage of the 640-candidate probe);
- queries/sec.

The corpus is synthesized CLUSTERED (the regime IVF exists for) into an
on-disk memmap chunk-wise, so nothing corpus-sized materializes in RAM —
the build itself streams it in chunks (index/ivf_pq.py).

Run:  SEMTOOLS_TPU_PLATFORM=cpu python benchmarks/quantitative/bench_ann_scale.py
      [--rows 10000000] [--queries 50] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402


def synth_clustered(path: str, n: int, d: int, n_clusters: int, seed: int = 0):
    """Unit-norm clustered rows written chunk-wise to an on-disk memmap.

    Same mixture-of-gaussians regime as run_bench._clustered_corpus:
    centers ~ N(0, I) (norm ~sqrt(d)) + 0.15 noise, so members cluster
    tightly (noise/center ~0.15) the way real line embeddings do —
    isotropic data would measure PQ noise, not index quality.
    """
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(n, d))
    chunk = 1 << 20
    for start in range(0, n, chunk):
        m = min(chunk, n - start)
        cid = rng.integers(0, n_clusters, m)
        rows = centers[cid] + 0.15 * rng.standard_normal((m, d)).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        mm[start:start + m] = rows
    mm.flush()
    return centers


def exact_topk(mm: np.ndarray, q: np.ndarray, k: int) -> np.ndarray:
    """Brute-force ground truth, chunked over the memmap (jax CPU)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def sims_fn(rows, qq):
        return jnp.dot(rows, qq.T, preferred_element_type=jnp.float32)

    chunk = 1 << 20
    best_d = np.full((q.shape[0], k), -np.inf, np.float32)
    best_i = np.zeros((q.shape[0], k), np.int64)
    qj = jnp.asarray(q)
    for start in range(0, mm.shape[0], chunk):
        s = np.asarray(sims_fn(jnp.asarray(mm[start:start + chunk]), qj)).T
        cand_d = np.concatenate([best_d, s], axis=1)
        cand_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(start, start + s.shape[1]),
                                     (q.shape[0], s.shape[1]))], axis=1)
        top = np.argsort(-cand_d, axis=1, kind="stable")[:, :k]
        best_d = np.take_along_axis(cand_d, top, axis=1)
        best_i = np.take_along_axis(cand_i, top, axis=1)
    return best_i


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--clusters", type=int, default=2000)
    ap.add_argument("--nprobe-sweep", default=None,
                    help="comma-separated probe depths to sweep on one build")
    args = ap.parse_args()

    from semtools_tpu.utils.platform import configure_jax

    configure_jax()
    from semtools_tpu.index.ivf_pq import IvfPqIndex

    n, d, k = args.rows, args.dim, args.k
    td = tempfile.mkdtemp(prefix="semtools_ann_scale_")
    corpus_path = os.path.join(td, "corpus.f32")
    t0 = time.perf_counter()
    centers = synth_clustered(corpus_path, n, d, args.clusters)
    synth_s = time.perf_counter() - t0
    mm = np.memmap(corpus_path, dtype=np.float32, mode="r", shape=(n, d))

    # queries = perturbed corpus rows (the served regime; matches
    # run_bench.bench_ivfpq's query model)
    del centers
    rng = np.random.default_rng(99)
    qrows = np.asarray(mm[np.sort(rng.integers(0, n, args.queries))])
    q = qrows + 0.05 * rng.standard_normal((args.queries, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    t0 = time.perf_counter()
    truth = exact_topk(mm, q, k)
    truth_s = time.perf_counter() - t0

    # the store's exact parameters (store.py build_ann_index /
    # _search_ann_batched / _ann_candidate_depth)
    from semtools_tpu.store.store import Store

    nlist = int(min(4096, max(16, 1 << int(np.log2(max(4 * np.sqrt(n), 16))))))
    nprobe = max(16, nlist // 16)
    oversample = Store._ann_candidate_depth(k, n, nlist, nprobe)

    t0 = time.perf_counter()
    index = IvfPqIndex.build(mm, nlist=nlist, m=32, keep_vectors=False)
    build_s = time.perf_counter() - t0

    # probe + store-style exact re-rank from the memmap, at one or more
    # probe depths (the sweep reuses the build — re-deriving the nprobe
    # scaling costs one query pass per depth, not a 40-minute rebuild)
    sweep = [int(x) for x in args.nprobe_sweep.split(",")] if args.nprobe_sweep else [nprobe]
    for np_probe in sweep:
        np_probe = min(np_probe, nlist)
        t0 = time.perf_counter()
        _, ids = index.search(q, k=oversample, nprobe=np_probe)
        probe_s = time.perf_counter() - t0
        cand_recall = np.mean([
            len(set(truth[r]) & set(ids[r][ids[r] >= 0])) / k
            for r in range(args.queries)
        ])
        t0 = time.perf_counter()
        got = np.zeros((args.queries, k), np.int64)
        for r in range(args.queries):
            cand = ids[r][ids[r] >= 0]
            exact = mm[cand] @ q[r]
            got[r] = cand[np.argsort(-exact, kind="stable")[:k]]
        rerank_s = time.perf_counter() - t0
        recall = np.mean([
            len(set(truth[r]) & set(got[r])) / k for r in range(args.queries)
        ])

        row = {
            "config": "ann_scale",
            "metric": "recall_at_10",
            "value": float(recall),
            "candidate_recall_at_10": float(cand_recall),
            "n": n, "dim": d, "clusters": args.clusters,
            "nlist": nlist, "nprobe": np_probe, "oversample": oversample,
            "build_seconds": build_s,
            "queries_per_sec": args.queries / (probe_s + rerank_s),
            "probe_seconds_per_query": probe_s / args.queries,
            "synth_seconds": synth_s, "truth_seconds": truth_s,
            "platform": os.environ.get("SEMTOOLS_TPU_PLATFORM", "default"),
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
