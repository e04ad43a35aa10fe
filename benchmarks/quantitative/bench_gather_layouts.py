"""Probe XLA gather performance across layouts/orders on the TPU.

Determines whether the embed gather (rows of a [V, D] table by token id)
can be made faster by sorting ids, transposing the table, shrinking the
table, or gathering through a matmul-style path.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

DIM = 256
VOCAB = 1 << 16
TOKENS = 1 << 19
REPEATS = 16


def _bench(fn, *args) -> float:
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / REPEATS


def loop(body, n_ids_mod):
    @jax.jit
    def run(ids, tab):
        def step(i, carry):
            acc, cur = carry
            acc = acc + body(cur, tab)
            cur = (cur + 1) % n_ids_mod
            return acc, cur

        acc, _ = jax.lax.fori_loop(0, REPEATS, step, (jnp.float32(0), ids))
        return acc

    return run


def main() -> None:
    key = jax.random.PRNGKey(1)
    table = jax.random.normal(key, (VOCAB, DIM), dtype=jnp.float32)
    ids = jax.random.randint(key, (TOKENS,), 0, VOCAB, dtype=jnp.int32)
    ids_sorted = jnp.sort(ids)
    table_t = table.T.copy()  # [D, V]
    small_table = table[:4096]  # 4 MB — VMEM-sized
    ids_small = ids % 4096

    def take_rows(cur, tab):
        rows = jnp.take(tab, cur, axis=0)
        return rows[0, 0] + rows[-1, -1]

    def take_cols(cur, tab):  # tab is [D, V], gather along lanes
        cols = jnp.take(tab, cur, axis=1)
        return cols[0, 0] + cols[-1, -1]

    results = {}
    t = _bench(loop(take_rows, VOCAB), ids, table)
    results["rows_random_ms"] = t * 1e3
    t = _bench(loop(take_rows, VOCAB), ids_sorted, table)
    results["rows_sorted_ms"] = t * 1e3
    t = _bench(loop(take_cols, VOCAB), ids, table_t)
    results["cols_random_ms"] = t * 1e3
    t = _bench(loop(take_rows, 4096), ids_small, small_table)
    results["rows_small_table_ms"] = t * 1e3

    # one-hot matmul gather on a VMEM-sized vocab tile, MXU path:
    # [T_tile, VT] onehot @ [VT, D]. Probes the per-tile cost the
    # sorted-stream design would pay.
    VT = 4096
    TT = 1 << 15

    def onehot_tile(cur, tab):
        oh = jax.nn.one_hot(cur[:TT] % VT, VT, dtype=jnp.bfloat16)
        rows = jnp.dot(oh, tab[:VT].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return rows[0, 0] + rows[-1, -1]

    t = _bench(loop(onehot_tile, VOCAB), ids, table)
    results["onehot_32k_tokens_x_4096vocab_ms"] = t * 1e3
    results["onehot_extrapolated_full_ms"] = t * 1e3 * (TOKENS / TT)

    # gather of int32 PACKED rows: [V, D] f32 viewed as wider rows?
    # probe a [V, 64] gather (quarter row) to see if cost scales with D
    def take_rows_narrow(cur, tab):
        rows = jnp.take(tab[:, :64], cur, axis=0)
        return rows[0, 0] + rows[-1, -1]

    t = _bench(loop(take_rows_narrow, VOCAB), ids, table)
    results["rows_narrow64_ms"] = t * 1e3

    # sort cost itself (argsort of T ids), for the sorted-stream budget
    @jax.jit
    def sort_cost(x):
        def step(i, carry):
            acc, cur = carry
            s = jnp.sort(cur)
            acc = acc + s[0].astype(jnp.float32)
            cur = cur + 1
            return acc, cur

        acc, _ = jax.lax.fori_loop(0, REPEATS, step, (jnp.float32(0), x))
        return acc

    t = _bench(sort_cost, ids)
    results["sort_T_ids_ms"] = t * 1e3

    results["tokens"] = TOKENS
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
