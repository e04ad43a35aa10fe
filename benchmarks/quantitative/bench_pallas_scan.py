"""Microbench: fused Pallas scan variants on the real chip.

Measures the two-phase exact scan (bf16/f32) and the int8-quantized scan
at bench scale, in chunk-vectors/ms/chip. The XLA matmul+top_k baseline
measured ~60k vecs/ms (dominated by the [Q, N] top_k); see git history.

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

from semtools_tpu.ops.int8_scan import _int8_two_phase, quantize_global  # noqa: E402
from semtools_tpu.ops.int8_scan import TILE_N as INT8_TILE  # noqa: E402
from semtools_tpu.ops.pallas_scan import _two_phase_topk, tile_for_dtype  # noqa: E402

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


def make_two_phase_runner(tile_n):
    @jax.jit
    def run(q0, e):
        def body(i, carry):
            acc, qq = carry
            d, idx = _two_phase_topk(qq, e, k=K, n_true=N, interpret=False,
                                     tile_n=tile_n)
            acc = acc + d[0, 0] + idx.astype(jnp.float32)[0, 0]
            qq = (qq.astype(jnp.float32) + 1e-12 * acc).astype(qq.dtype)
            return acc, qq

        acc, _ = jax.lax.fori_loop(0, REPEATS, body, (jnp.float32(0), q0))
        return acc

    return run


@jax.jit
def run_int8(q8, e8):
    def body(i, carry):
        acc, qq = carry
        s, idx = _int8_two_phase(qq, e8, k=K, n_true=N, interpret=False)
        acc = acc + s[0, 0] + idx.astype(jnp.float32)[0, 0]
        qq = qq + (acc > 1e30).astype(jnp.int8)
        return acc, qq

    acc, _ = jax.lax.fori_loop(0, REPEATS, body, (jnp.float32(0), q8))
    return acc


def main():
    results = {}
    for dtype, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        e = corpus(N, dtype)
        q = corpus(Q, dtype)
        tile = tile_for_dtype(dtype)
        t = bench(make_two_phase_runner(tile), q, e)
        results[f"two_phase_{name}_tile{tile}"] = round(N / (t * 1e3), 1)
        print(json.dumps({f"two_phase_{name}_tile{tile}_vecs_per_ms":
                          results[f"two_phase_{name}_tile{tile}"]}), flush=True)
        del e

    import numpy as np

    rng = np.random.Generator(np.random.Philox(0))
    x = rng.standard_normal((N, DIM), dtype=np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    e8_np, _ = quantize_global(x)
    del x
    q8_np, _ = quantize_global(rng.standard_normal((Q, DIM), dtype=np.float32))
    e8 = jnp.asarray(e8_np)
    q8 = jnp.asarray(q8_np)
    t = bench(run_int8, q8, e8)
    results["int8"] = round(N / (t * 1e3), 1)
    print(json.dumps({f"int8_tile{INT8_TILE}_vecs_per_ms": results["int8"]}), flush=True)


if __name__ == "__main__":
    main()
