"""Component-level timing of the device embed path (gather + pool + norm).

Answers: where does embed time go, and what would a fused/bf16/combined
variant buy? Run on the real chip:

    python benchmarks/quantitative/bench_embed_variants.py

Each variant folds REPEATS into one jitted fori_loop with a data
dependency (same methodology as bench.py) so dispatch latency and
host sync are amortized out.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

DIM = 256
VOCAB = 1 << 16
TOKENS = 1 << 19
LINES = 1 << 15
REPEATS = 16


def _bench(fn, *args) -> float:
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / REPEATS


def main() -> None:
    key = jax.random.PRNGKey(1)
    table = jax.random.normal(key, (VOCAB, DIM), dtype=jnp.float32)
    table_bf16 = table.astype(jnp.bfloat16)
    flat_ids = jax.random.randint(key, (TOKENS,), 0, VOCAB, dtype=jnp.int32)
    seg_ids = jnp.sort(
        jax.random.randint(key, (TOKENS,), 0, LINES, dtype=jnp.int32)
    )
    weights = jnp.ones((TOKENS,), jnp.float32)

    def loop(body):
        @jax.jit
        def run(ids, tab, segs, w):
            def step(i, carry):
                acc, cur = carry
                acc = acc + body(cur, tab, segs, w)
                cur = (cur + 1) % VOCAB
                return acc, cur

            acc, _ = jax.lax.fori_loop(0, REPEATS, step, (jnp.float32(0), ids))
            return acc

        return run

    # 1. gather only
    def gather_only(ids, tab, segs, w):
        rows = jnp.take(tab, ids, axis=0)
        return rows[0, 0] + rows[-1, -1]

    # 2. segment_sum only (on a fixed [T, D] that skips the gather)
    fixed_rows = jnp.ones((TOKENS, DIM), jnp.float32)

    @jax.jit
    def seg_only(rows, segs, w):
        def step(i, carry):
            acc, r = carry
            sums = jax.ops.segment_sum(
                r, segs, num_segments=LINES + 1, indices_are_sorted=True
            )
            acc = acc + sums[0, 0]
            r = r + acc * 1e-30
            return acc, r

        acc, _ = jax.lax.fori_loop(0, REPEATS, step, (jnp.float32(0), rows))
        return acc

    # 3. full current path (gather + 2x segment_sum + norm)
    def full_f32(ids, tab, segs, w):
        rows = jnp.take(tab, ids, axis=0) * w[:, None]
        sums = jax.ops.segment_sum(
            rows, segs, num_segments=LINES + 1, indices_are_sorted=True
        )
        counts = jax.ops.segment_sum(
            w, segs, num_segments=LINES + 1, indices_are_sorted=True
        )
        mean = sums / jnp.maximum(counts, 1.0)[:, None]
        norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
        emb = jnp.where(norm > 0, mean / jnp.maximum(norm, 1e-30), mean)
        return emb[0, 0]

    # 4. fused single segment_sum (ones column carries the counts)
    def fused_counts(ids, tab, segs, w):
        rows = jnp.take(tab, ids, axis=0) * w[:, None]
        aug = jnp.concatenate([rows, w[:, None]], axis=1)
        both = jax.ops.segment_sum(
            aug, segs, num_segments=LINES + 1, indices_are_sorted=True
        )
        mean = both[:, :DIM] / jnp.maximum(both[:, DIM:], 1.0)
        norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
        emb = jnp.where(norm > 0, mean / jnp.maximum(norm, 1e-30), mean)
        return emb[0, 0]

    # 5. bf16 table variant of the full path
    def full_bf16(ids, tab, segs, w):
        rows = jnp.take(tab, ids, axis=0).astype(jnp.float32) * w[:, None]
        sums = jax.ops.segment_sum(
            rows, segs, num_segments=LINES + 1, indices_are_sorted=True
        )
        counts = jax.ops.segment_sum(
            w, segs, num_segments=LINES + 1, indices_are_sorted=True
        )
        mean = sums / jnp.maximum(counts, 1.0)[:, None]
        norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
        emb = jnp.where(norm > 0, mean / jnp.maximum(norm, 1e-30), mean)
        return emb[0, 0]

    results = {}
    t = _bench(loop(gather_only), flat_ids, table, seg_ids, weights)
    results["gather_only_ms"] = t * 1e3
    t = _bench(seg_only, fixed_rows, seg_ids, weights)
    results["segment_sum_only_ms"] = t * 1e3
    t = _bench(loop(full_f32), flat_ids, table, seg_ids, weights)
    results["full_f32_ms"] = t * 1e3
    results["full_f32_lines_per_s"] = LINES / t
    t = _bench(loop(fused_counts), flat_ids, table, seg_ids, weights)
    results["fused_counts_ms"] = t * 1e3
    results["fused_counts_lines_per_s"] = LINES / t
    t = _bench(loop(full_bf16), flat_ids, table_bf16, seg_ids, weights)
    results["full_bf16_ms"] = t * 1e3
    results["full_bf16_lines_per_s"] = LINES / t

    results["tokens"] = TOKENS
    results["lines"] = LINES
    results["gather_gbps_f32"] = TOKENS * DIM * 4 / (results["gather_only_ms"] * 1e-3) / 1e9
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
