"""Feasibility microbench: int4-packed tile-max sweep.

Two int4 values per byte, layout split by dimension halves (dims 0-127 in
low nibbles, 128-255 in high nibbles) so in-kernel unpack is two shifts +
a lane concat, no interleave. Measures the phase-1 sweep only.

    python benchmarks/quantitative/bench_int4_sweep.py
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

DIM = 256
HALF = DIM // 2
N = 1 << 21
Q = 8
REPEATS = 64
TILE = 2048
NEG_INF = float("-inf")


def pack_int4(x: np.ndarray, scale: float) -> np.ndarray:
    """[N, 256] f32 -> [N, 128] uint8 (lo nibble dims 0-127, hi 128-255)."""
    q = np.clip(np.rint(x / scale), -7, 7).astype(np.int8)
    lo = q[:, :HALF] & 0xF
    hi = q[:, HALF:] & 0xF
    return (lo | (hi << 4)).astype(np.uint8)


def sweep_kernel(q_ref, e_ref, out_ref, *, n_true: int):
    i = pl.program_id(0)
    qn = q_ref.shape[0]
    packed = e_ref[:].astype(jnp.int32)  # [TILE, 128]
    # sign-extend the two nibbles
    lo = jnp.left_shift(packed, 28) >> 28
    hi = jnp.left_shift(packed, 24) >> 28
    e = jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)  # [TILE, 256]
    sims = jax.lax.dot_general(
        q_ref[:].astype(jnp.bfloat16), e,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, TILE), 1)
    sims = jnp.where(col + i * TILE < n_true, sims, NEG_INF)
    out_ref[0] = jnp.broadcast_to(jnp.max(sims, axis=1)[None, :], (8, qn))


@functools.partial(jax.jit, static_argnames=())
def sweep(q8, e4):
    num_tiles = e4.shape[0] // TILE
    return pl.pallas_call(
        functools.partial(sweep_kernel, n_true=N),
        grid_spec=pl.GridSpec(
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((Q, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, HALF), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, Q), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, Q), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * e4.shape[0] * DIM,
            bytes_accessed=e4.shape[0] * HALF,
            transcendentals=0,
        ),
    )(q8, e4)


def main():
    rng = np.random.Generator(np.random.Philox(0))
    x = rng.standard_normal((N, DIM), dtype=np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    scale = float(np.max(np.abs(x))) / 7.0
    e4 = jnp.asarray(pack_int4(x, scale))
    q8 = jnp.asarray(np.clip(np.rint(x[:Q] / (float(np.max(np.abs(x[:Q]))) / 127.0)), -127, 127).astype(np.int8))

    # correctness spot check vs numpy unpack
    tm = np.asarray(sweep(q8, e4))[:, 0, :]  # [T, Q]
    q_int = np.asarray(q8, np.int64)
    unpacked = np.concatenate([
        (np.asarray(e4, np.uint8)[:, :] & 0xF).astype(np.int8) - ((np.asarray(e4, np.uint8) & 0x8) << 1).astype(np.int8),
        (np.asarray(e4, np.uint8) >> 4).astype(np.int8) - ((np.asarray(e4, np.uint8) >> 4 & 0x8) << 1).astype(np.int8),
    ], axis=1).astype(np.int64)
    sims_ref = q_int @ unpacked.T  # [Q, N]
    tm_ref = sims_ref.reshape(Q, -1, TILE).max(axis=2).T  # [T, Q]
    err = np.max(np.abs(tm - tm_ref))
    print(json.dumps({"max_tilemax_err": float(err)}), flush=True)

    @jax.jit
    def run(q0, e):
        def body(i, carry):
            acc, qq = carry
            t = sweep(qq, e)
            acc = acc + t[0, 0, 0] + t[-1, 0, 0]
            qq = qq + (acc > 1e30).astype(qq.dtype)
            return acc, qq
        acc, _ = jax.lax.fori_loop(0, REPEATS, body, (jnp.float32(0), q0))
        return acc

    float(run(q8, e4))
    t0 = time.perf_counter()
    float(run(q8, e4))
    dt = (time.perf_counter() - t0) / REPEATS
    print(json.dumps({"int4_sweep_vecs_per_ms": round(N / (dt * 1e3), 1)}), flush=True)


if __name__ == "__main__":
    main()
