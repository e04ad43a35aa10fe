"""Incremental ANN serving under mutation (vs full-rebuild staleness).

Pre-round-3 the IVF-PQ tier went STALE on any mutation: at its serving
scale a 1-doc edit degraded whole-store queries to minutes-long host
scans until a full rebuild (2,123 s at 10M rows). The tier now serves
mutations through tombstones + an ADC-encoded delta reconciled at query
time from the build-time layout (store._ann_current — the reference's
qdrant-edge equivalently supports in-place upsert/delete).

This measures the real thing end-to-end through a Store at 1M rows:
build seconds (the cost the incremental path avoids), warm ANN query,
then a 1-doc edit followed immediately by queries — reporting the
reconcile-inclusive first query and the steady-state warm query after,
plus correctness of the edited rows.

Run:  SEMTOOLS_TPU_PLATFORM=cpu python benchmarks/quantitative/bench_ann_incremental.py
      [--rows 1000000]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--docs", type=int, default=1000)
    args = ap.parse_args()

    from semtools_tpu.utils.platform import configure_jax

    configure_jax()
    from semtools_tpu.store.store import Store

    os.environ["SEMTOOLS_TPU_FORCE_ANN"] = "1"
    os.environ.setdefault("SEMTOOLS_TPU_SHARDED", "0")

    n, d = args.rows, 256
    per = n // args.docs
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((2000, d)).astype(np.float32)
    tmp = tempfile.mkdtemp(prefix="ann_incr_")
    s = Store(str(Path(tmp) / "ws"), dim=d)
    bulk = []
    for i in range(args.docs):
        cid = rng.integers(0, 2000, per)
        rows = centers[cid] + 0.15 * rng.standard_normal((per, d)).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        bulk.append((f"/doc{i:04}.txt", rows))
        if len(bulk) >= 100:
            s.upsert_documents_bulk(bulk)
            bulk = []
    if bulk:
        s.upsert_documents_bulk(bulk)
    paths = [f"/doc{i:04}.txt" for i in range(args.docs)]

    t0 = time.perf_counter()
    s.build_ann_index(force=True)
    build_s = time.perf_counter() - t0

    mm = s._mmap("r")
    q = np.asarray(mm[12345]) + 0.05 * rng.standard_normal(d).astype(np.float32)
    q /= np.linalg.norm(q)
    del mm
    s.search_line_embeddings(q, paths, 10)  # warm executables
    t0 = time.perf_counter()
    s.search_line_embeddings(q, paths, 10)
    warm_s = time.perf_counter() - t0
    assert s.serving_tier() == "ivf-pq"

    # 1-doc edit: the tier must keep serving, no rebuild
    new_rows = centers[rng.integers(0, 2000, per)]
    new_rows = new_rows + 0.15 * rng.standard_normal((per, d)).astype(np.float32)
    new_rows /= np.linalg.norm(new_rows, axis=1, keepdims=True)
    t0 = time.perf_counter()
    s.upsert_document_lines("/doc0042.txt", new_rows)
    hits = s.search_line_embeddings(new_rows[7], paths, 1)
    edit_query_s = time.perf_counter() - t0
    assert (hits[0].path, hits[0].line_number) == ("/doc0042.txt", 7), hits[0]
    assert hits[0].distance < 1e-4
    assert s.serving_tier() == "ivf-pq"
    t0 = time.perf_counter()
    s.search_line_embeddings(q, paths, 10)
    warm_after_s = time.perf_counter() - t0

    print(json.dumps({
        "config": "ann_incremental",
        "metric": "edit_plus_query_seconds",
        "value": round(edit_query_s, 3),
        "n": n, "docs": args.docs, "doc_rows": per,
        "build_seconds": round(build_s, 1),
        "warm_query_s": round(warm_s, 3),
        "warm_query_after_edit_s": round(warm_after_s, 3),
        "speedup_vs_rebuild": round(build_s / max(edit_query_s, 1e-9), 1),
        "platform": os.environ.get("SEMTOOLS_TPU_PLATFORM", "default"),
    }))
    s.close()


if __name__ == "__main__":
    main()
