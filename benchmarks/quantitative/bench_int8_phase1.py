"""Isolate phase-1 (tile-max sweep) cost of the int8 scan and probe
variants: convert-free, mask-free, no-dot — to locate the gap between
the measured headline (~75% of HBM peak) and the roofline.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DIM = 256
TILE = 8192
NUM_TILES = 1221  # ~10M rows, matches bench.py
N = TILE * NUM_TILES
Q = 8
REPEATS = 32
NEG_INF = float("-inf")


def _corpus_int8(seed=0):
    key = jax.random.PRNGKey(seed)

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen(key, n):
        x = jax.random.normal(key, (n, DIM), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return jnp.clip(jnp.rint(x / (0.35 / 127.0)), -127, 127).astype(jnp.int8)

    parts = []
    made = 0
    i = 0
    while made < N:
        n = int(min(TILE * 512, N - made))
        parts.append(gen(jax.random.PRNGKey(i), n=n))
        made += n
        i += 1
    return jnp.concatenate(parts, axis=0)


def _bench(fn, *args) -> float:
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / REPEATS


def loop(phase1):
    @jax.jit
    def run(q0, e):
        def body(i, carry):
            acc, qq = carry
            tm = phase1(qq, e)
            acc = acc + tm[0, 0]
            qq = qq + (acc > 1e30).astype(jnp.int8)
            return acc, qq

        acc, _ = jax.lax.fori_loop(0, REPEATS, body, (jnp.float32(0), q0))
        return acc

    return run


def make_phase1(kernel_body, out_cols=Q):
    def phase1(q8, e8):
        return pl.pallas_call(
            kernel_body,
            grid_spec=pl.GridSpec(
                grid=(NUM_TILES,),
                in_specs=[
                    pl.BlockSpec((Q, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE, DIM), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 8, out_cols), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((NUM_TILES, 8, out_cols), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * Q * N * DIM, bytes_accessed=N * DIM, transcendentals=0
            ),
        )(q8, e8)[:, 0, :]

    return phase1


def main() -> None:
    e8 = _corpus_int8()
    q8 = e8[:Q]
    results = {}

    # A. current phase-1: convert + dot + mask + max
    def k_full(q_ref, e_ref, out_ref):
        i = pl.program_id(0)
        sims = jax.lax.dot_general(
            q_ref[:].astype(jnp.bfloat16), e_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (Q, TILE), 1)
        sims = jnp.where(col + i * TILE < N, sims, NEG_INF)
        out_ref[0] = jnp.broadcast_to(jnp.max(sims, axis=1)[None, :], (8, Q))

    t = _bench(loop(make_phase1(k_full)), q8, e8)
    results["phase1_full_vecs_per_ms"] = N / (t * 1e3)

    # B. no mask (dot + max only)
    def k_nomask(q_ref, e_ref, out_ref):
        sims = jax.lax.dot_general(
            q_ref[:].astype(jnp.bfloat16), e_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = jnp.broadcast_to(jnp.max(sims, axis=1)[None, :], (8, Q))

    t = _bench(loop(make_phase1(k_nomask)), q8, e8)
    results["phase1_nomask_vecs_per_ms"] = N / (t * 1e3)

    # C. no dot: convert + row-sum (isolates convert + stream cost)
    def k_convsum(q_ref, e_ref, out_ref):
        rows = e_ref[:].astype(jnp.bfloat16)
        s = jnp.sum(rows, axis=0, keepdims=True, dtype=jnp.float32)  # [1, DIM]
        out_ref[0] = jnp.broadcast_to(s[:, :Q], (8, Q))

    t = _bench(loop(make_phase1(k_convsum)), q8, e8)
    results["convert_sum_vecs_per_ms"] = N / (t * 1e3)

    # D. pure stream: int8 sum, no convert (roofline probe)
    def k_stream(q_ref, e_ref, out_ref):
        s = jnp.sum(e_ref[:], axis=0, keepdims=True, dtype=jnp.int32)  # [1, DIM]
        out_ref[0] = jnp.broadcast_to(s[:, :Q].astype(jnp.float32), (8, Q))

    t = _bench(loop(make_phase1(k_stream)), q8, e8)
    results["pure_stream_vecs_per_ms"] = N / (t * 1e3)
    results["pure_stream_gbps"] = N * DIM / (t) / 1e9

    # E. int8 direct MXU dot (preferred f32), no convert op
    def k_i8dot(q_ref, e_ref, out_ref):
        sims = jax.lax.dot_general(
            q_ref[:], e_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = jnp.broadcast_to(jnp.max(sims, axis=1)[None, :], (8, Q))

    try:
        t = _bench(loop(make_phase1(k_i8dot)), q8, e8)
        results["int8_direct_dot_vecs_per_ms"] = N / (t * 1e3)
    except Exception as exc:  # lowering may fail
        results["int8_direct_dot_vecs_per_ms"] = f"failed: {type(exc).__name__}"

    # F. convert via int8 -> f32 (skip bf16), f32 MXU dot
    def k_f32dot(q_ref, e_ref, out_ref):
        sims = jax.lax.dot_general(
            q_ref[:].astype(jnp.float32), e_ref[:].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = jnp.broadcast_to(jnp.max(sims, axis=1)[None, :], (8, Q))

    t = _bench(loop(make_phase1(k_f32dot)), q8, e8)
    results["f32_convert_dot_vecs_per_ms"] = N / (t * 1e3)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
