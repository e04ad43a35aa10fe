"""Headline benchmark: corpus-scan throughput on one chip.

Measures the framework's hot path — the dense cosine scan + top-k that
replaces the reference's per-line SIMD loop (src/search/mod.rs:84-86) — in
chunk-vectors scanned per millisecond per chip. BASELINE.md's north-star
target is >=1M chunk-vectors/ms/chip; ``vs_baseline`` is the ratio against
that target.

Prints exactly ONE JSON line. Extra context metrics (f32-storage scan,
embed throughput) ride along as additional keys.

Design notes:
- the corpus is generated ON DEVICE (host->device transfer of a GB-scale
  matrix would dominate wall time on tunneled-TPU hosts and benches the
  pipe, not the chip);
- repeats are folded into a single jitted ``fori_loop`` so per-dispatch
  RPC latency is amortized out of the measurement;
- bf16 storage is the headline (ranking quality is unaffected for
  retrieval; HBM traffic halves); f32 rides along for the parity
  configuration.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

DIM = 256
N_BF16 = 1 << 21  # 2M vectors * 256 * 2B = 1 GB
N_F32 = 1 << 20  # 1M vectors * 256 * 4B = 1 GB
Q = 8
K = 10
REPEATS = 256

EMBED_TOKENS = 1 << 19
EMBED_LINES = 1 << 15


def _device_corpus(n: int, dtype) -> jax.Array:
    key = jax.random.PRNGKey(0)
    e = jax.random.normal(key, (n, DIM), dtype=jnp.float32)
    e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
    return e.astype(dtype)


def _scan_bench(e: jax.Array, precision) -> float:
    """Seconds per full-corpus scan (amortized over REPEATS)."""
    q = _device_corpus(Q, e.dtype)

    # NOTE: e must be an ARGUMENT, not a closure capture — jit inlines
    # closed-over arrays as HLO constants, which would push the GB-scale
    # corpus through the compiler.
    @jax.jit
    def run(q0, ee):
        def body(i, carry):
            acc, qq = carry
            sims = jnp.dot(
                qq, ee.T, preferred_element_type=jnp.float32, precision=precision
            )
            vals, idx = jax.lax.top_k(sims, K)
            # Fold results into the carried query so no iteration can be
            # folded away or hoisted.
            acc = acc + vals[0, 0] + idx.astype(jnp.float32)[0, 0]
            qq = (qq.astype(jnp.float32) + 1e-12 * acc).astype(qq.dtype)
            return acc, qq

        acc, _ = jax.lax.fori_loop(0, REPEATS, body, (jnp.float32(0), q0))
        return acc

    # float() forces a device->host readback of the scalar result: on
    # tunneled runtimes block_until_ready can return before execution
    # finishes, but a value transfer cannot.
    float(run(q, e))  # compile + warm
    t0 = time.perf_counter()
    float(run(q, e))
    t1 = time.perf_counter()
    return (t1 - t0) / REPEATS


def _embed_bench() -> float:
    """Lines embedded per second on device (gather + segment-mean + norm)."""
    key = jax.random.PRNGKey(1)
    vocab = 1 << 16
    table = jax.random.normal(key, (vocab, DIM), dtype=jnp.float32)
    flat_ids = jax.random.randint(key, (EMBED_TOKENS,), 0, vocab, dtype=jnp.int32)
    seg_ids = jnp.sort(
        jax.random.randint(key, (EMBED_TOKENS,), 0, EMBED_LINES, dtype=jnp.int32)
    )
    weights = jnp.ones((EMBED_TOKENS,), jnp.float32)

    @jax.jit
    def run(fids, tab, segs, w):
        def body(i, carry):
            acc, ids = carry
            rows = jnp.take(tab, ids, axis=0) * w[:, None]
            sums = jax.ops.segment_sum(
                rows, segs, num_segments=EMBED_LINES + 1, indices_are_sorted=True
            )
            counts = jax.ops.segment_sum(
                w, segs, num_segments=EMBED_LINES + 1, indices_are_sorted=True
            )
            mean = sums / jnp.maximum(counts, 1.0)[:, None]
            norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
            emb = jnp.where(norm > 0, mean / jnp.maximum(norm, 1e-30), mean)
            acc = acc + emb[0, 0]
            ids = (ids + 1) % vocab
            return acc, ids

        acc, _ = jax.lax.fori_loop(0, 4, body, (jnp.float32(0), fids))
        return acc

    args = (flat_ids, table, seg_ids, weights)
    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    float(run(*args))
    t1 = time.perf_counter()
    per_call = (t1 - t0) / 4
    return EMBED_LINES / per_call


def main() -> None:
    e_bf16 = _device_corpus(N_BF16, jnp.bfloat16)
    t_bf16 = _scan_bench(e_bf16, jax.lax.Precision.DEFAULT)
    del e_bf16
    bf16_vecs_per_ms = N_BF16 / (t_bf16 * 1e3)

    e_f32 = _device_corpus(N_F32, jnp.float32)
    t_f32 = _scan_bench(e_f32, jax.lax.Precision.HIGHEST)
    del e_f32
    f32_vecs_per_ms = N_F32 / (t_f32 * 1e3)

    embed_lines_per_s = _embed_bench()

    print(
        json.dumps(
            {
                "metric": "scan_chunk_vectors_per_ms_per_chip",
                "value": round(bf16_vecs_per_ms, 1),
                "unit": "chunk-vectors/ms/chip (bf16 storage, q=8, top-10)",
                "vs_baseline": round(bf16_vecs_per_ms / 1e6, 3),
                "f32_exact_vectors_per_ms": round(f32_vecs_per_ms, 1),
                "embed_lines_per_s": round(embed_lines_per_s, 1),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
