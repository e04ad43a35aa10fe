"""CPU baseline for the embed pipeline — the denominator for BASELINE.md's
">=10x embed throughput vs reference CPU path" target.

The reference's encode (model2vec-rs via src/search/mod.rs:69) is, after
host tokenization: embedding-table row gather -> mean pool per line ->
L2 normalize, on CPU. This measures faithful CPU implementations of that
exact op at the same workload shape as bench.py's device measurement
(2^19 tokens over 2^15 lines, vocab 65536, dim 256, token ids
precomputed — tokenization is host-side and identical in both systems,
so it cancels):

- numpy: gather + np.add.reduceat segment mean + normalize;
- torch: torch.nn.functional.embedding_bag(mode="mean") + normalize —
  the op model2vec's CPU path amounts to, using however many threads
  torch grants (reported).

Prints one JSON line per implementation:
    python benchmarks/quantitative/bench_embed_baseline.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

VOCAB = 1 << 16
DIM = 256
TOKENS = 1 << 19
LINES = 1 << 15
REPEATS = 5


def _workload(seed=1):
    rng = np.random.default_rng(seed)
    table = rng.standard_normal((VOCAB, DIM)).astype(np.float32)
    ids = rng.integers(0, VOCAB, TOKENS).astype(np.int64)
    segs = np.sort(rng.integers(0, LINES, TOKENS)).astype(np.int64)
    return table, ids, segs


def bench_numpy(table, ids, segs) -> float:
    # reduceat boundaries for the sorted segment ids
    boundaries = np.searchsorted(segs, np.arange(LINES))
    counts = np.bincount(segs, minlength=LINES).astype(np.float32)

    def run():
        rows = table[ids]
        sums = np.add.reduceat(rows, boundaries, axis=0)
        mean = sums / np.maximum(counts, 1.0)[:, None]
        norms = np.linalg.norm(mean, axis=1, keepdims=True)
        return np.where(norms > 0, mean / np.maximum(norms, 1e-30), mean)

    run()  # warm page cache
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = run()
    dt = (time.perf_counter() - t0) / REPEATS
    assert out.shape == (LINES, DIM)
    return LINES / dt


def bench_torch(table, ids, segs) -> tuple:
    import torch
    import torch.nn.functional as F

    t_table = torch.from_numpy(table)
    t_ids = torch.from_numpy(ids)
    offsets = torch.from_numpy(np.searchsorted(segs, np.arange(LINES)))

    def run():
        mean = F.embedding_bag(t_ids, t_table, offsets, mode="mean")
        return F.normalize(mean, dim=1, eps=1e-30)

    run()
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = run()
    dt = (time.perf_counter() - t0) / REPEATS
    assert out.shape == (LINES, DIM)
    return LINES / dt, torch.get_num_threads()


def main():
    table, ids, segs = _workload()
    np_lps = bench_numpy(table, ids, segs)
    print(json.dumps({
        "config": "embed_cpu_baseline", "impl": "numpy-reduceat",
        "metric": "lines_per_sec", "value": round(np_lps, 1),
        "cores_available": os.cpu_count(),
        "tokens": TOKENS, "lines": LINES, "dim": DIM,
    }))
    try:
        th_lps, nthreads = bench_torch(table, ids, segs)
        print(json.dumps({
            "config": "embed_cpu_baseline", "impl": "torch-embedding-bag",
            "metric": "lines_per_sec", "value": round(th_lps, 1),
            "threads": nthreads, "cores_available": os.cpu_count(),
            "tokens": TOKENS, "lines": LINES, "dim": DIM,
        }))
    except ImportError:
        pass


if __name__ == "__main__":
    main()
