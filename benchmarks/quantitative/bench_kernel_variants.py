"""Kernel-variant sweep for the tile-max phase (the headline's hot loop).

Tries storage dtype x tile size x compute recipe combinations of the
phase-1 sweep kernel in isolation (selection phases are negligible) to
find the fastest corpus-streaming configuration on the real chip.

    python benchmarks/quantitative/bench_kernel_variants.py
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

DIM = 256
N = 1 << 21
Q = 8
REPEATS = 64
NEG_INF = float("-inf")


def sweep_kernel(q_ref, e_ref, out_ref, *, tile_n: int, recipe: str):
    i = pl.program_id(0)
    qn = q_ref.shape[0]
    e = e_ref[:]
    q = q_ref[:]
    if recipe == "convert_bf16":
        e = e.astype(jnp.bfloat16)
        q = q.astype(jnp.bfloat16)
    sims = jax.lax.dot_general(
        q, e,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if recipe == "int_dot" else jnp.float32,
    )
    sims = sims.astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, tile_n), 1)
    sims = jnp.where(col + i * tile_n < N, sims, NEG_INF)
    out_ref[0] = jnp.broadcast_to(jnp.max(sims, axis=1)[None, :], (8, qn))


@functools.partial(jax.jit, static_argnames=("tile_n", "recipe"))
def sweep(q, e, *, tile_n: int, recipe: str):
    num_tiles = e.shape[0] // tile_n
    return pl.pallas_call(
        functools.partial(sweep_kernel, tile_n=tile_n, recipe=recipe),
        grid_spec=pl.GridSpec(
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((q.shape[0], DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, DIM), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, q.shape[0]), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, q.shape[0]), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q.shape[0] * e.shape[0] * DIM,
            bytes_accessed=e.shape[0] * DIM * e.dtype.itemsize,
            transcendentals=0,
        ),
    )(q, e)


def runner(tile_n, recipe):
    @jax.jit
    def run(q0, e):
        def body(i, carry):
            acc, qq = carry
            tm = sweep(qq, e, tile_n=tile_n, recipe=recipe)
            acc = acc + tm[0, 0, 0] + tm[-1, 0, 0]
            # Data dependency so no iteration can be hoisted/CSE'd: the
            # predicate is never true but XLA cannot prove it.
            bump = (acc > 1e30).astype(qq.dtype)
            qq = qq + bump
            return acc, qq

        acc, _ = jax.lax.fori_loop(0, REPEATS, body, (jnp.float32(0), q0))
        return acc

    return run


def bench(fn, *args):
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / REPEATS


def main():
    key = jax.random.PRNGKey(0)
    base = jax.random.normal(key, (N, DIM), dtype=jnp.float32)
    base = base / jnp.linalg.norm(base, axis=1, keepdims=True)

    import os

    cases = [
        ("bf16", "plain", 2048),
        ("bf16", "plain", 4096),
        ("int8", "convert_bf16", 2048),
        ("int8", "convert_bf16", 4096),
        ("int8", "convert_bf16", 8192),
        ("int8", "int_dot", 8192),
    ]
    only = os.environ.get("BENCH_CASES")  # e.g. "0,2" by index
    if only:
        idx = [int(x) for x in only.split(",")]
        cases = [cases[i] for i in idx]
    for dtype_name, recipe, tile_n in cases:
        if dtype_name == "bf16":
            e = base.astype(jnp.bfloat16)
            q = e[:Q]
        else:
            scaled = jnp.clip(jnp.rint(base * 127.0 / jnp.max(jnp.abs(base))), -127, 127)
            e = scaled.astype(jnp.int8)
            q = e[:Q]
        t = bench(runner(tile_n, recipe), q, e)
        print(json.dumps({
            "dtype": dtype_name, "recipe": recipe, "tile": tile_n,
            "vecs_per_ms": round(N / (t * 1e3), 1),
        }), flush=True)
        del e


if __name__ == "__main__":
    main()
