"""One-off TPU probe for the int4 kernel: on-chip correctness + throughput.

Usage: python scripts/probe_int4.py  (expects a real accelerator)
"""
from __future__ import annotations

import functools
import time

from semtools_tpu.utils.platform import configure_jax

configure_jax()

import jax
import jax.numpy as jnp
import numpy as np

from semtools_tpu.ops.int4_scan import (
    _int4_two_phase,
    int4_topk_scan,
    quantize_pack_global,
    unpack_int4,
)
from semtools_tpu.ops.int8_scan import quantize_global

print("device:", jax.devices()[0])

DIM = 256
Q = 8
K = 10
REPEATS = 64
N_INT4 = 8192 * 1221  # same 10M-row corpus as bench.py's int8 headline

# ---- correctness on chip: 60k rows vs host oracle ----
rng = np.random.default_rng(0)
n = 60_000
x = rng.standard_normal((n, DIM)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
p4, es = quantize_pack_global(x)
q = x[:4]
d_got, i_got = int4_topk_scan(q, p4, es, 10, interpret=False)
q8, qs = quantize_global(q)
sims = q8.astype(np.int64) @ unpack_int4(p4).astype(np.int64).T
ok = True
for r in range(4):
    order = np.lexsort((np.arange(n), -sims[r]))[:10]
    if list(i_got[r]) != list(order):
        ok = False
        print("MISMATCH q", r, i_got[r], order)
print("on-chip selection correctness:", "OK" if ok else "FAILED")

# masked variant on chip
mask = (rng.random(n) < 0.3).astype(np.int8)
mask[:10] = 1
d_m, i_m = int4_topk_scan(q, p4, es, 10, mask=jnp.asarray(mask))
okm = True
for r in range(4):
    s = sims[r].astype(np.float64).copy()
    s[mask == 0] = -np.inf
    order = np.lexsort((np.arange(n), -s))[:10]
    if list(i_m[r]) != list(order):
        okm = False
        print("MASKED MISMATCH q", r, i_m[r], order)
print("on-chip masked correctness:", "OK" if okm else "FAILED")

# ---- throughput at 10M rows ----
scale = 0.35 / 7.0


@functools.partial(jax.jit, static_argnames=("n",))
def gen_chunk(key, n):
    xx = jax.random.normal(key, (n, DIM), dtype=jnp.float32)
    xx = xx / jnp.linalg.norm(xx, axis=1, keepdims=True)
    qv = jnp.clip(jnp.rint(xx / scale), -7, 7).astype(jnp.int32)
    lo = (qv[:, : DIM // 2] + 8) & 0xF
    hi = qv[:, DIM // 2 :] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


chunk = 8192 * 512
parts = []
made = 0
i = 0
while made < N_INT4:
    m = int(min(chunk, N_INT4 - made))
    parts.append(gen_chunk(jax.random.PRNGKey(i), n=m))
    made += m
    i += 1
p4d = jnp.concatenate(parts, axis=0)
q8d = jnp.asarray(rng.integers(-127, 128, size=(Q, DIM)).astype(np.int8))

for tile in (16384, 32768):
    @jax.jit
    def run(q0, e):
        def body(_, carry):
            acc, qq = carry
            s, idx = _int4_two_phase(qq, e, N_INT4, k=K, interpret=False,
                                     tile_n=tile)
            acc = acc + s[0, 0] + idx.astype(jnp.float32)[0, 0]
            qq = qq + (acc > 1e30).astype(jnp.int8)
            return acc, qq

        acc, _ = jax.lax.fori_loop(0, REPEATS, body, (jnp.float32(0), q0))
        return acc

    float(run(q8d, p4d))  # compile + warm
    t0 = time.perf_counter()
    float(run(q8d, p4d))
    dt = (time.perf_counter() - t0) / REPEATS
    print(f"tile_n={tile}: {N_INT4 / dt / 1e3 / 1e3:.3f}M vecs/ms "
          f"({N_INT4 * (DIM // 2) / dt / 1e9:.1f} GB/s)")
