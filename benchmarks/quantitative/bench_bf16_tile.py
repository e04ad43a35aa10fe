"""Streaming-tile sweep for the bf16 two-phase scan (2M-row config).

With the SUB_N sub-tile rescan, phase-2 traffic no longer scales with
the streaming tile, so each dtype can take the pipeline's best ~2 MB
block. Measured on TPU v5e: 992k vecs/ms @2048, 1004k @4096, 1002k
@8192 -> tile_for_dtype picks 4096 for 2-byte dtypes.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from semtools_tpu.ops.pallas_scan import _two_phase_topk

DIM, N, Q, K, REPEATS = 256, 1 << 21, 8, 10, 64


def bench(q, e, tile):
    @jax.jit
    def run(q0, ee):
        def body(i, carry):
            acc, qq = carry
            d, idx = _two_phase_topk(qq, ee, k=K, n_true=N, interpret=False,
                                     tile_n=tile)
            acc = acc + d[0, 0] + idx.astype(jnp.float32)[0, 0]
            qq = (qq.astype(jnp.float32) + 1e-12 * acc).astype(qq.dtype)
            return acc, qq

        acc, _ = jax.lax.fori_loop(0, REPEATS, body, (jnp.float32(0), q0))
        return acc

    float(run(q, e))
    t0 = time.perf_counter()
    float(run(q, e))
    t = (time.perf_counter() - t0) / REPEATS
    return N / (t * 1e3)


def main() -> None:
    key = jax.random.PRNGKey(0)
    e = jax.random.normal(key, (N, DIM), dtype=jnp.float32)
    e = (e / jnp.linalg.norm(e, axis=1, keepdims=True)).astype(jnp.bfloat16)
    q = e[:Q]
    out = {}
    for tile in (2048, 4096, 8192):
        out[f"bf16_tile{tile}_vecs_per_ms"] = round(bench(q, e, tile), 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
