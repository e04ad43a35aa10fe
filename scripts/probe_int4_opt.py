"""Probe unpack variants for the int4 kernel on the real chip.

THROUGHPUT-ONLY: the variants here are not numerically equivalent to the
shipped kernel — e.g. the `& 15` variant's low-half placeholder
(`lo = u - 0`) skips the bias fold, and its packing is unbiased unlike
the shipped split-half format. Use these numbers to compare unpack
instruction sequences, never as correctness references (ADVICE r3)."""
from __future__ import annotations

import functools
import time

from semtools_tpu.utils.platform import configure_jax

configure_jax()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DIM = 256
Q = 8
REPEATS = 32
N = 8192 * 512  # 4.2M rows — enough to be HBM-bound, fast to generate

scale = 0.35 / 7.0


@functools.partial(jax.jit, static_argnames=("n",))
def gen_chunk(key, n):
    xx = jax.random.normal(key, (n, DIM), dtype=jnp.float32)
    xx = xx / jnp.linalg.norm(xx, axis=1, keepdims=True)
    qv = jnp.clip(jnp.rint(xx / scale), -7, 7).astype(jnp.int32)
    lo = qv[:, : DIM // 2] & 0xF
    hi = qv[:, DIM // 2 :] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


p4d = jnp.concatenate(
    [gen_chunk(jax.random.PRNGKey(i), n=8192 * 128) for i in range(4)], axis=0
)
rng = np.random.default_rng(0)
q8d = jnp.asarray(rng.integers(-127, 128, size=(Q, DIM)).astype(np.int8))


def sims_shift(q_ref, p_ref):
    p32 = p_ref[:].astype(jnp.int32)
    lo = ((p32 << 28) >> 28).astype(jnp.bfloat16)
    hi = (p32 >> 4).astype(jnp.bfloat16)
    d2 = p_ref.shape[1]
    q = q_ref[:]
    ql = q[:, :d2].astype(jnp.bfloat16)
    qh = q[:, d2:].astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    return (
        jax.lax.dot_general(ql, lo, dimension_numbers=dn, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(qh, hi, dimension_numbers=dn, preferred_element_type=jnp.float32)
    )


def sims_mask(q_ref, p_ref):
    # low nibble via & 15 (unsigned) + per-query bias correction done by
    # the caller adding -8*sum(ql); here fold it approximately: compute
    # u - 8 directly as bf16 (one subtract, no second shift chain).
    p32 = p_ref[:].astype(jnp.int32)
    u = (p32 & 15).astype(jnp.bfloat16)  # lo + 8 if we pre-biased; raw here
    lo = u - jnp.bfloat16(0)  # placeholder: raw two's complement differs
    hi = (p32 >> 4).astype(jnp.bfloat16)
    d2 = p_ref.shape[1]
    q = q_ref[:]
    ql = q[:, :d2].astype(jnp.bfloat16)
    qh = q[:, d2:].astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    return (
        jax.lax.dot_general(ql, lo, dimension_numbers=dn, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(qh, hi, dimension_numbers=dn, preferred_element_type=jnp.float32)
    )


def make_kernel(sims_fn, tile_n):
    def _kern(q_ref, p_ref, out_ref):
        qn = q_ref.shape[0]
        s = tile_n // 512
        sims = sims_fn(q_ref, p_ref)
        sub_max = jnp.max(sims.reshape(qn, s, 512), axis=2)
        out_ref[0] = jnp.broadcast_to(sub_max[None, :, :], (8, qn, s))

    @jax.jit
    def run(q8, p4):
        num_tiles = p4.shape[0] // tile_n
        s = tile_n // 512
        out = pl.pallas_call(
            _kern,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((Q, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, DIM // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, Q, s), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_tiles, 8, Q, s), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * Q * p4.shape[0] * DIM,
                bytes_accessed=p4.shape[0] * (DIM // 2),
                transcendentals=0,
            ),
        )(q8, p4)

        def body(_, carry):
            acc, qq = carry
            o = pl.pallas_call(
                _kern,
                grid=(num_tiles,),
                in_specs=[
                    pl.BlockSpec((Q, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_n, DIM // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 8, Q, s), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((num_tiles, 8, Q, s), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=2 * Q * p4.shape[0] * DIM,
                    bytes_accessed=p4.shape[0] * (DIM // 2),
                    transcendentals=0,
                ),
            )(qq, p4)
            acc = acc + o[0, 0, 0, 0]
            qq = qq + (acc > 1e30).astype(jnp.int8)
            return acc, qq

        acc, _ = jax.lax.fori_loop(0, REPEATS, body, (jnp.float32(0), q8))
        return acc

    return run


def bench(name, sims_fn, tile_n):
    try:
        run = make_kernel(sims_fn, tile_n)
        float(run(q8d, p4d))
        t0 = time.perf_counter()
        float(run(q8d, p4d))
        dt = (time.perf_counter() - t0) / REPEATS
        print(f"{name} tile={tile_n}: {N / dt / 1e6:.2f}M vecs/ms "
              f"({N * (DIM // 2) / dt / 1e9:.1f} GB/s)")
    except Exception as e:
        print(f"{name} tile={tile_n}: FAILED {type(e).__name__}: {str(e)[:200]}")


print("device:", jax.devices()[0])
for tile in (8192, 16384, 32768):
    bench("shift", sims_shift, tile)
bench("mask+sub(placeholder)", sims_mask, 16384)


# native int4 dtype probe
def sims_native(q_ref, p_ref):
    e = p_ref[:].astype(jnp.bfloat16)  # [tile, DIM] from int4
    q = q_ref[:].astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    return jax.lax.dot_general(q, e, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)


def bench_native(tile_n):
    try:
        e4 = jax.random.randint(
            jax.random.PRNGKey(9), (8192 * 64, DIM), -7, 8, dtype=jnp.int32
        ).astype(jnp.int4)

        def _kern(q_ref, p_ref, out_ref):
            s = tile_n // 512
            sims = sims_native(q_ref, p_ref)
            sub_max = jnp.max(sims.reshape(Q, s, 512), axis=2)
            out_ref[0] = jnp.broadcast_to(sub_max[None, :, :], (8, Q, s))

        num_tiles = e4.shape[0] // tile_n
        s = tile_n // 512
        run = jax.jit(lambda qq, pp: pl.pallas_call(
            _kern,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((Q, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, DIM), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, Q, s), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_tiles, 8, Q, s), jnp.float32),
        )(qq, pp))
        out = run(q8d, e4)
        out.block_until_ready()
        print("native int4 pallas load: COMPILES")
    except Exception as e:
        print(f"native int4: FAILED {type(e).__name__}: {str(e)[:300]}")


bench_native(8192)
