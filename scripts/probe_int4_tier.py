"""TPU probe backing the int4 serving-tier policy (store.py).

Measures, on the real chip, the two numbers the tier policy needs:

1. candidate recall@10 of the int4 fused kernel vs oversample depth, at
   2M and 10M rows on the tier_recall clustered-corpus family
   (benchmarks/quantitative/run_bench.py::_clustered_corpus). The store
   re-ranks candidates exactly from the f32 mmap, so candidate recall
   EQUALS served tier recall — this sweep calibrates
   Store._rerank_oversample's int4 branch.
2. int4 kernel throughput vs selection k (the oversample depth is the
   kernel's k), at 2M and 10M rows, Q=8 — the phase-2 extraction runs k
   argmax rounds per candidate block, so depth is not free; this sweep
   bounds the usable depth and sets the int8->int4 crossover row count.

Everything is generated and merged ON DEVICE: the stdio tunnel to the
bench chip moves 0.1-30 MB/s, so the corpus (1.28 GB packed at 10M rows)
must never cross it. The f32 corpus is regenerated chunk-by-chunk from
the same PRNG keys for the exact oracle; only [Q, k]-sized results ever
download.

Usage: python scripts/probe_int4_tier.py [--rows 2097152] [--quick]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semtools_tpu.utils.platform import configure_jax

configure_jax()

import jax
import jax.numpy as jnp
import numpy as np

DIM = 256
Q_RECALL = 50
Q_PERF = 8
K = 10
N_CLUSTERS = 512
CHUNK = 1 << 20  # 1M-row f32 regeneration chunks (1 GB HBM transient)


def _keys(seed):
    return jax.random.PRNGKey(seed)


@functools.partial(jax.jit, static_argnames=("n",))
def _gen_chunk(centers, seed, n):
    """Rows [seed*CHUNK, seed*CHUNK+n) of the clustered corpus, unit-norm
    f32 — same family as run_bench._clustered_corpus (512 clusters,
    0.15 within-cluster noise)."""
    ka, kn = jax.random.split(_keys(seed + 1000))
    assign = jax.random.randint(ka, (n,), 0, N_CLUSTERS)
    x = centers[assign] + 0.15 * jax.random.normal(kn, (n, DIM), jnp.float32)
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("n",))
def _pack_chunk(centers, seed, n, scale):
    x = _gen_chunk(centers, seed, n)
    qv = jnp.clip(jnp.rint(x / scale), -7, 7).astype(jnp.int32)
    lo = (qv[:, : DIM // 2] + 8) & 15
    hi = qv[:, DIM // 2 :] & 15
    return (lo | (hi << 4)).astype(jnp.int8)


@jax.jit
def _oracle_step(q, chunk, base, best_v, best_i):
    sims = jnp.dot(q, chunk.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    v, i = jax.lax.top_k(sims, K)
    cat_v = jnp.concatenate([best_v, v], axis=1)
    cat_i = jnp.concatenate([best_i, i + base], axis=1)
    nv, pos = jax.lax.top_k(cat_v, K)
    return nv, jnp.take_along_axis(cat_i, pos, axis=1)


def build(n_rows):
    centers = jax.random.normal(_keys(0), (N_CLUSTERS, DIM), jnp.float32)
    # global int4 scale from the true amax (first chunk is representative:
    # same centers, same noise scale; pad the bound a hair for tail rows)
    c0 = _gen_chunk(centers, 0, min(CHUNK, n_rows))
    scale = float(jnp.max(jnp.abs(c0))) * 1.02 / 7.0

    parts = []
    done = 0
    seed = 0
    while done < n_rows:
        n = int(min(CHUNK, n_rows - done))
        parts.append(_pack_chunk(centers, seed, n, scale))
        done += n
        seed += 1
    p4 = jnp.concatenate(parts, axis=0)
    del parts

    # queries: near corpus rows from chunk 0 (the tier_recall family)
    kq, kn = jax.random.split(_keys(7))
    ids = jax.random.randint(kq, (Q_RECALL,), 0, min(CHUNK, n_rows))
    qs = c0[ids] + 0.05 * jax.random.normal(kn, (Q_RECALL, DIM), jnp.float32)
    qs = qs / jnp.linalg.norm(qs, axis=1, keepdims=True)

    # exact f32 oracle, chunk-merged on device
    bv = jnp.full((Q_RECALL, K), -jnp.inf)
    bi = jnp.zeros((Q_RECALL, K), jnp.int32)
    done, seed = 0, 0
    while done < n_rows:
        n = int(min(CHUNK, n_rows - done))
        chunk = _gen_chunk(centers, seed, n)
        bv, bi = _oracle_step(qs, chunk, done, bv, bi)
        done += n
        seed += 1
    oracle = np.asarray(bi)
    return p4, scale, np.asarray(qs), oracle


def deep_sweep(p4, qs, oracle, n_rows, out):
    """Recall + candidate volume + latency of the serving design: the
    margin-threshold deep-candidate extraction (int4_deep_candidates)
    followed by an exact re-rank (here: oracle membership, identical
    since the re-rank is exact)."""
    from semtools_tpu.ops.int4_scan import int4_deep_candidates

    for sig in (4.0, 6.0):
        hit = 0
        counts = []
        times = []
        for s in range(0, Q_RECALL, 8):
            t0 = time.perf_counter()
            ids = int4_deep_candidates(
                qs[s : s + 8], p4, n_true=n_rows, interpret=False,
                margin_sigmas=sig,
            )
            times.append(time.perf_counter() - t0)
            for r in range(ids.shape[0]):
                cand = set(int(i) for i in ids[r] if i < n_rows)
                counts.append(len(cand))
                hit += len(cand & set(map(int, oracle[s + r])))
        row = {"probe": "int4_deep_recall", "n": n_rows, "margin_sigmas": sig,
               "recall_at_10": round(hit / (Q_RECALL * K), 4),
               "median_candidates": int(np.median(counts)),
               "max_candidates": int(np.max(counts)),
               "cap": int(ids.shape[1]),
               "warm_batch8_ms": round(min(times) * 1e3, 1)}
        print(json.dumps(row), flush=True)
        out.append(row)


def recall_sweep(p4, scale, qs, oracle, n_rows, out):
    from semtools_tpu.ops.int4_scan import int4_topk_scan

    for depth in (40, 64, 128, 256, 512, 1024):
        if depth > n_rows:
            break
        got = []
        for s in range(0, Q_RECALL, 8):
            _, idx = int4_topk_scan(
                qs[s : s + 8], p4, scale, depth, n_true=n_rows,
                interpret=False,
            )
            got.append(np.asarray(idx))
        cand = np.concatenate(got, axis=0)
        hit = sum(
            len(set(map(int, cand[r])) & set(map(int, oracle[r])))
            for r in range(Q_RECALL)
        )
        rec = hit / (Q_RECALL * K)
        row = {"probe": "int4_candidate_recall", "n": n_rows,
               "depth": depth, "recall_at_10": round(rec, 4)}
        print(json.dumps(row), flush=True)
        out.append(row)
        if rec == 1.0:
            break


def perf_sweep(p4, scale, n_rows, out, ks=(10, 64, 128, 256)):
    from semtools_tpu.ops.int4_scan import _int4_two_phase

    q8 = jnp.asarray(
        np.random.default_rng(0).integers(-127, 127, (Q_PERF, DIM), np.int64),
        jnp.int8,
    )
    repeats = 32

    for k in ks:
        if k > n_rows:
            break

        @jax.jit
        def run(q0, e):
            def body(i, carry):
                acc, qq = carry
                s, idx = _int4_two_phase(qq, e, n_rows, k=k, interpret=False)
                acc = acc + s[0, 0] + idx.astype(jnp.float32)[0, 0]
                qq = qq + (acc > 1e30).astype(jnp.int8)
                return acc, qq

            acc, _ = jax.lax.fori_loop(0, repeats, body, (jnp.float32(0), q0))
            return acc

        float(run(q8, p4))  # compile + warm
        t0 = time.perf_counter()
        float(run(q8, p4))
        dt = (time.perf_counter() - t0) / repeats
        row = {"probe": "int4_throughput", "n": n_rows, "k": k, "q": Q_PERF,
               "vecs_per_ms": round(n_rows / (dt * 1e3), 1),
               "ms_per_scan": round(dt * 1e3, 3)}
        print(json.dumps(row), flush=True)
        out.append(row)


def int8_ref(n_rows, out):
    """int8 tier throughput at the same size (crossover calibration)."""
    from semtools_tpu.ops.int8_scan import TILE_N, _int8_two_phase

    n_pad = ((n_rows + TILE_N - 1) // TILE_N) * TILE_N

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen(seed, n):
        x = jax.random.normal(_keys(seed), (n, DIM), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return jnp.clip(jnp.rint(x / (0.35 / 127.0)), -127, 127).astype(jnp.int8)

    parts, done, seed = [], 0, 0
    while done < n_pad:
        n = int(min(CHUNK, n_pad - done))
        parts.append(gen(seed, n))
        done += n
        seed += 1
    e8 = jnp.concatenate(parts, axis=0)
    del parts
    q8 = e8[:Q_PERF]
    repeats = 32

    @jax.jit
    def run(q0, e):
        def body(i, carry):
            acc, qq = carry
            s, idx = _int8_two_phase(qq, e, n_rows, k=40, interpret=False)
            acc = acc + s[0, 0] + idx.astype(jnp.float32)[0, 0]
            qq = qq + (acc > 1e30).astype(jnp.int8)
            return acc, qq

        acc, _ = jax.lax.fori_loop(0, repeats, body, (jnp.float32(0), q0))
        return acc

    float(run(q8, e8))
    t0 = time.perf_counter()
    float(run(q8, e8))
    dt = (time.perf_counter() - t0) / repeats
    row = {"probe": "int8_ref_throughput", "n": n_rows, "k": 40, "q": Q_PERF,
           "vecs_per_ms": round(n_rows / (dt * 1e3), 1)}
    print(json.dumps(row), flush=True)
    out.append(row)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[1 << 21, 8192 * 1221])
    ap.add_argument("--skip-int8-ref", action="store_true")
    ap.add_argument("--skip-row-level", action="store_true")
    args = ap.parse_args()
    print("device:", jax.devices()[0], flush=True)

    out = []
    for n_rows in args.sizes:
        # pad to the int4 tile so the kernel never re-pads per call
        from semtools_tpu.ops.int4_scan import TILE_N

        t0 = time.perf_counter()
        p4, scale, qs, oracle = build(n_rows)
        pad = (-p4.shape[0]) % TILE_N
        if pad:
            p4 = jnp.concatenate(
                [p4, jnp.zeros((pad, DIM // 2), jnp.int8)], axis=0
            )
        print(f"# built n={n_rows} in {time.perf_counter()-t0:.1f}s", flush=True)
        deep_sweep(p4, qs, oracle, n_rows, out)
        if not args.skip_row_level:
            recall_sweep(p4, scale, qs, oracle, n_rows, out)
            perf_sweep(p4, scale, n_rows, out)
        del p4
        if not args.skip_int8_ref:
            int8_ref(n_rows, out)

    with open("/tmp/probe_int4_tier.json", "w") as f:
        json.dump(out, f, indent=1)
    print("# wrote /tmp/probe_int4_tier.json", flush=True)


if __name__ == "__main__":
    main()
