"""Sweep the HBM->VMEM streaming pipeline's operating point.

The int8 scan's phase 1 is limited by raw stream bandwidth (597 GB/s of
~819 GB/s peak with 2 MB auto-pipelined blocks). Sweep block sizes and a
manually double/triple-buffered DMA kernel to find the roof.
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
N = 8192 * 1221  # ~10M rows
REPEATS = 32


def _corpus_int8():
    @functools.partial(jax.jit, static_argnames=("n",))
    def gen(key, n):
        x = jax.random.normal(key, (n, DIM), dtype=jnp.float32)
        return jnp.clip(jnp.rint(x * 80), -127, 127).astype(jnp.int8)

    parts, made, i = [], 0, 0
    while made < N:
        n = int(min(8192 * 512, N - made))
        parts.append(gen(jax.random.PRNGKey(i), n=n))
        made += n
        i += 1
    return jnp.concatenate(parts, axis=0)


def _bench(fn, *args) -> float:
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / REPEATS


def loop(stream_fn):
    """Fold REPEATS into one jit; a varying int32 operand reaches every
    kernel call so XLA cannot hoist the (otherwise loop-invariant)
    stream out of the fori_loop."""

    @jax.jit
    def run(e):
        def body(i, acc):
            s = stream_fn(e, i)
            return acc + s[0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0))

    return run


def auto_stream(tile):
    num_tiles = N // tile
    n_use = num_tiles * tile

    def kernel(salt_ref, e_ref, out_ref):
        out_ref[0] = salt_ref[0, 0] + jnp.sum(
            e_ref[:], axis=0, keepdims=True, dtype=jnp.int32
        )

    def fn(e, salt):
        return pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(num_tiles,),
                in_specs=[
                    pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                    pl.BlockSpec((tile, DIM), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1, DIM), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((num_tiles, 1, DIM), jnp.int32),
        )(salt.reshape(1, 1), e[:n_use])[:, 0, :]

    return fn


def manual_stream(tile, n_buf):
    num_tiles = N // tile
    n_use = num_tiles * tile

    def kernel(salt_ref, e_hbm, out_ref):
        def body(scratch, sems):
            def get_dma(slot, idx):
                return pltpu.make_async_copy(
                    e_hbm.at[pl.ds(idx * tile, tile), :],
                    scratch.at[slot], sems.at[slot],
                )

            for b in range(n_buf):
                get_dma(b, b).start()

            def step(idx, acc):
                slot = jax.lax.rem(idx, n_buf)
                get_dma(slot, idx).wait()
                acc = acc + jnp.sum(scratch[slot], axis=0, keepdims=True,
                                    dtype=jnp.int32)

                @pl.when(idx + n_buf < num_tiles)
                def _():
                    get_dma(slot, idx + n_buf).start()

                return acc

            acc = jax.lax.fori_loop(
                0, num_tiles, step, jnp.full((1, DIM), salt_ref[0, 0], jnp.int32)
            )
            out_ref[:] = acc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((n_buf, tile, DIM), jnp.int8),
            sems=pltpu.SemaphoreType.DMA((n_buf,)),
        )

    def fn(e, salt):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, DIM), jnp.int32),
        )(salt.reshape(1, 1), e[:n_use])

    return fn


def main() -> None:
    e8 = _corpus_int8()
    results = {}
    for tile in (2048, 4096, 8192, 16384, 24576):
        t = _bench(loop(auto_stream(tile)), e8)
        gbps = N * DIM / t / 1e9
        results[f"auto_tile{tile}_gbps"] = round(gbps, 1)
    for tile, n_buf in ((4096, 2), (4096, 4), (8192, 2), (8192, 3),
                        (16384, 2), (2048, 4), (2048, 8)):
        try:
            t = _bench(loop(manual_stream(tile, n_buf)), e8)
            gbps = N * DIM / t / 1e9
            results[f"manual_t{tile}_b{n_buf}_gbps"] = round(gbps, 1)
        except Exception as exc:
            results[f"manual_t{tile}_b{n_buf}_gbps"] = f"failed: {type(exc).__name__}"
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
