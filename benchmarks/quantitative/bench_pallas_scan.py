"""Microbench: fused Pallas scan kernel vs the XLA matmul+top_k scan.

Isolates the headline hot path at bench scale. Run on the real TPU:
    python benchmarks/quantitative/bench_pallas_scan.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from semtools_tpu.ops.pallas_scan import (  # noqa: E402
    _merge,
    _pallas_candidates,
    _two_phase_topk,
)

DIM = 256
N = 1 << 21
Q = 8
K = 10
REPEATS = 64


def corpus(n, dtype):
    key = jax.random.PRNGKey(0)
    e = jax.random.normal(key, (n, DIM), dtype=jnp.float32)
    e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
    return e.astype(dtype)


def bench(fn, *args) -> float:
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / REPEATS


@jax.jit
def run_xla(q0, e):
    def body(i, carry):
        acc, qq = carry
        sims = jnp.dot(qq, e.T, preferred_element_type=jnp.float32)
        vals, idx = jax.lax.top_k(sims, K)
        acc = acc + vals[0, 0] + idx.astype(jnp.float32)[0, 0]
        qq = (qq.astype(jnp.float32) + 1e-12 * acc).astype(qq.dtype)
        return acc, qq

    acc, _ = jax.lax.fori_loop(0, REPEATS, body, (jnp.float32(0), q0))
    return acc


@jax.jit
def run_pallas(q0, e):
    def body(i, carry):
        acc, qq = carry
        cv, ci = _pallas_candidates(qq, e, k=K, n_true=N, interpret=False)
        d, idx = _merge(cv, ci, k=K)
        acc = acc + d[0, 0] + idx.astype(jnp.float32)[0, 0]
        qq = (qq.astype(jnp.float32) + 1e-12 * acc).astype(qq.dtype)
        return acc, qq

    acc, _ = jax.lax.fori_loop(0, REPEATS, body, (jnp.float32(0), q0))
    return acc


@jax.jit
def run_two_phase(q0, e):
    def body(i, carry):
        acc, qq = carry
        d, idx = _two_phase_topk(qq, e, k=K, n_true=N, interpret=False)
        acc = acc + d[0, 0] + idx.astype(jnp.float32)[0, 0]
        qq = (qq.astype(jnp.float32) + 1e-12 * acc).astype(qq.dtype)
        return acc, qq

    acc, _ = jax.lax.fori_loop(0, REPEATS, body, (jnp.float32(0), q0))
    return acc


def main():
    for dtype, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        e = corpus(N, dtype)
        q = corpus(Q, dtype)
        t_x = bench(run_xla, q, e)
        t_p = bench(run_pallas, q, e)
        t_2 = bench(run_two_phase, q, e)
        print(json.dumps({
            "dtype": name,
            "xla_vecs_per_ms": round(N / (t_x * 1e3), 1),
            "pallas_vecs_per_ms": round(N / (t_p * 1e3), 1),
            "two_phase_vecs_per_ms": round(N / (t_2 * 1e3), 1),
            "speedup_vs_xla": round(t_x / t_2, 2),
        }))
        del e


if __name__ == "__main__":
    main()
