"""Headline benchmark: corpus-scan throughput on one chip.

Measures the framework's hot path — the fused Pallas cosine scan + exact
top-k selection that replaces the reference's per-line SIMD loop
(src/search/mod.rs:84-86) — in chunk-vectors scanned per millisecond per
chip. BASELINE.md's north-star target is >=1M chunk-vectors/ms/chip;
``vs_baseline`` is the ratio against that target.

The headline configuration is the int8 compressed tier
(semtools_tpu/ops/int8_scan.py: global-scale int8 storage, in-VMEM bf16
convert, two-phase exact selection). The bf16 two-phase scan
(ops/pallas_scan.py), raw int4 packed scan, and device embed throughput
ride along as context. For the record: the naive XLA matmul+lax.top_k
path measures ~396k vecs/ms device-side on this chip (f32) — the fused
kernels beat it 1.5x at equal dtype by fusing selection into the stream,
and 6x via the int8 tier's byte-per-dim storage.

Prints exactly ONE JSON line.

DEGRADATION-PROOF TIMING (r5, after BENCH_r04 recorded 0.578x target on
code that measures 2.35x — the stdio tunnel's dispatch+readback latency
was billed to the kernel):
- every metric is timed by PAIRED DIFFERENCE: the same jitted function
  runs its fori_loop at R and 2R repeats (trip count is traced, so both
  share one executable) and the per-iteration time is (t(2R)-t(R))/R —
  constant per-call overhead (tunnel RTT, dispatch, scalar readback)
  cancels EXACTLY, whatever its size;
- >=3 trials per metric, min-take over positive differences (transient
  stalls inflate individual trials; they cannot deflate one);
- an explicit link-health probe (RTT + bulk upload rate) runs before
  and after the headline metric and is EMITTED in the record, so a
  degraded capture is marked degraded instead of recorded as the
  number; if post-health disagrees with pre-health by >3x the headline
  trials re-run once and the best set wins.

Other design notes:
- the corpus is generated ON DEVICE (host->device transfer of a GB-scale
  matrix would bench the tunnel pipe, not the chip);
- repeats are folded into a single jitted ``fori_loop`` with a data
  dependency between iterations so nothing can be hoisted or folded;
- ``float()`` readback forces completion (block_until_ready can return
  early on tunneled runtimes; a value transfer cannot);
- the headline (int8) runs FIRST; ride-alongs are skipped when the soft
  deadline (SEMTOOLS_TPU_BENCH_DEADLINE, default 1500 s) has passed, so
  a crawling link still yields a headline record.
"""

from __future__ import annotations

import json
import os
import threading
import time

# Tunnel watchdog: on this bench host the chip is reached through a
# stdio tunnel that sometimes wedges entirely (observed 2026-08-17
# ~20:00: jax.devices() blocks forever in every process). A hung bench
# records NOTHING; an explicit error record is strictly more useful.
# Healthy init takes 20-40 s; 300 s means the link is gone.
_init_done = threading.Event()


def _watchdog():
    if not _init_done.wait(300.0):
        print(json.dumps({
            "metric": "scan_chunk_vectors_per_ms_per_chip",
            "value": 0.0,
            "unit": "chunk-vectors/ms/chip",
            "vs_baseline": 0.0,
            "error": "device init exceeded 300s: TPU tunnel unreachable "
                     "(environment outage, not a framework regression; "
                     "see BENCH_r02.json for the last healthy run)",
        }), flush=True)
        os._exit(3)


threading.Thread(target=_watchdog, daemon=True).start()

from semtools_tpu.utils.platform import configure_jax

# Persistent XLA compile cache: without it every bench run recompiles
# all executables, and compile round-trips over the tunnel can blow the
# driver's timeout on degraded days (first observed 2026-08-17).
configure_jax()

import numpy as np

import jax
import jax.numpy as jnp

jax.devices()  # force backend init under the watchdog
_init_done.set()

_START = time.monotonic()
_DEADLINE = float(os.environ.get("SEMTOOLS_TPU_BENCH_DEADLINE", "1500"))

DIM = 256
N = 1 << 21  # 2M vectors (bf16 ride-along config)
# Headline corpus: ~10M chunk vectors (tile-aligned), 2.5 GB as int8 —
# the BASELINE "sharded 10M-chunk corpus" scale served from ONE chip.
N_INT8 = 8192 * 1221
Q = 8
K = 10
REPEATS = 64

EMBED_TOKENS = 1 << 19
EMBED_LINES = 1 << 15

BASELINE_VECS_PER_MS = 1_000_000.0


def _time_left() -> float:
    return _DEADLINE - (time.monotonic() - _START)


def _link_health() -> dict:
    """RTT (median of 5 scalar round-trips) + bulk upload rate.

    The 8 MB probe is only paid when a 256 kB probe shows >2 MB/s —
    at the tunnel's observed 0.05 MB/s floor an 8 MB payload takes
    minutes, and the small probe's number is the honest answer."""
    x = jnp.zeros((8,), jnp.float32)
    float(x.sum())  # ensure compiled outside the timed loop
    rtts = []
    for _ in range(5):
        t0 = time.monotonic()
        float((x + 1.0).sum())
        rtts.append(time.monotonic() - t0)
    rtt_ms = float(np.median(rtts) * 1e3)

    small = np.zeros(1 << 16, np.float32)  # 256 kB
    # max of two: the process's FIRST host->device transfer pays one-time
    # path setup (r5 capture measured 1.5 MB/s pre vs 66 MB/s post on a
    # healthy link and falsely marked the record degraded)
    small_rate = 0.0
    for _ in range(2):
        t0 = time.monotonic()
        jnp.asarray(small).block_until_ready()
        small_rate = max(
            small_rate, small.nbytes / max(time.monotonic() - t0, 1e-9)
        )
    up = small_rate
    if small_rate > 2e6:
        big = np.zeros(1 << 21, np.float32)  # 8 MB
        for _ in range(2):  # max-take: first pays transfer-path setup
            t0 = time.monotonic()
            jnp.asarray(big).block_until_ready()
            up = max(up, big.nbytes / max(time.monotonic() - t0, 1e-9))
    return {"rtt_ms": round(rtt_ms, 2), "up_MBps": round(up / 1e6, 2)}


def _health_disagrees(a: dict, b: dict) -> bool:
    ra, rb = max(a["rtt_ms"], 1e-3), max(b["rtt_ms"], 1e-3)
    ua, ub = max(a["up_MBps"], 1e-3), max(b["up_MBps"], 1e-3)
    return max(ra, rb) / min(ra, rb) > 3.0 or max(ua, ub) / min(ua, ub) > 3.0


def _paired_seconds_per_iter(run, args, lo: int = REPEATS,
                             hi: int = 2 * REPEATS):
    """Per-iteration seconds by paired difference, min over >=3 trials.

    Returns (seconds_per_iter, trials) where trials is the raw
    [[t_lo, t_hi], ...] list for the emitted record. Transient stalls
    can only INFLATE a single call; min-take over positive differences
    discards them. If every pair came out non-positive (a stall hit
    every long call), falls back to min(t_hi)/hi — an upper bound on
    per-iteration time, i.e. a LOWER bound on the reported rate."""
    float(run(*args, jnp.int32(hi)))  # compile + warm (shared executable)
    diffs, trials = [], []
    attempts = 0
    while attempts < 7 and len(diffs) < 3:
        attempts += 1
        t0 = time.perf_counter()
        float(run(*args, jnp.int32(lo)))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(*args, jnp.int32(hi)))
        t_hi = time.perf_counter() - t0
        trials.append([round(t_lo, 4), round(t_hi, 4)])
        d = (t_hi - t_lo) / (hi - lo)
        if d > 0:
            diffs.append(d)
    if diffs:
        return min(diffs), trials
    return min(t[1] for t in trials) / hi, trials


def _unit_corpus(n: int) -> jax.Array:
    key = jax.random.PRNGKey(0)
    e = jax.random.normal(key, (n, DIM), dtype=jnp.float32)
    return e / jnp.linalg.norm(e, axis=1, keepdims=True)


def _int8_corpus() -> jax.Array:
    """~10M unit rows quantized to int8, generated on device in chunks
    (a single f32 [10M, 256] intermediate would not fit HBM)."""
    import functools

    from semtools_tpu.ops.int8_scan import TILE_N

    scale = 0.35 / 127.0  # conservative amax bound for unit 256-d rows

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen_chunk(key, n):
        x = jax.random.normal(key, (n, DIM), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return jnp.clip(jnp.rint(x / scale), -127, 127).astype(jnp.int8)

    chunk = TILE_N * 512
    parts = []
    made = 0
    i = 0
    while made < N_INT8:
        n = int(min(chunk, N_INT8 - made))
        parts.append(gen_chunk(jax.random.PRNGKey(i), n=n))
        made += n
        i += 1
    return jnp.concatenate(parts, axis=0)


def _int8_bench():
    from semtools_tpu.ops.int8_scan import _int8_two_phase, tile_for_rows

    e8 = _int8_corpus()
    q8 = e8[:Q]
    tile = tile_for_rows(N_INT8)

    @jax.jit
    def run(q0, e, reps):
        def body(i, carry):
            acc, qq = carry
            s, idx = _int8_two_phase(qq, e, k=K, n_true=N_INT8, interpret=False,
                                     tile_n=tile)
            acc = acc + s[0, 0] + idx.astype(jnp.float32)[0, 0]
            qq = qq + (acc > 1e30).astype(jnp.int8)  # unprovable, keeps deps
            return acc, qq

        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), q0))
        return acc

    return _paired_seconds_per_iter(run, (q8, e8))


def _int4_bench():
    """Raw int4 packed-scan rate (two-phase exact top-10 over the
    quantized sims) at the 10M-row headline scale — the capacity rung's
    kernel. Ride-along context: serving through this tier adds the
    margin-bounded deep extraction + exact re-rank, whose cost scales
    with candidate density (see ARCHITECTURE.md), so the int8 tier stays
    the serving headline at on-budget sizes."""
    import functools

    from semtools_tpu.ops.int4_scan import (
        TILE_N as T4,
        _int4_two_phase,
        tile_for_rows as tile4,
    )

    scale = 0.35 / 7.0

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen_chunk(key, n):
        x = jax.random.normal(key, (n, DIM), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        qv = jnp.clip(jnp.rint(x / scale), -7, 7).astype(jnp.int32)
        lo = (qv[:, : DIM // 2] + 8) & 15
        hi = qv[:, DIM // 2 :] & 15
        return (lo | (hi << 4)).astype(jnp.int8)

    n_pad = ((N_INT8 + T4 - 1) // T4) * T4
    parts, made, i = [], 0, 0
    while made < n_pad:
        n = int(min(T4 * 64, n_pad - made))
        parts.append(gen_chunk(jax.random.PRNGKey(i), n=n))
        made += n
        i += 1
    p4 = jnp.concatenate(parts, axis=0)
    del parts
    rng_h = jax.random.randint(
        jax.random.PRNGKey(99), (Q, DIM), -127, 128, dtype=jnp.int32
    )
    q8 = rng_h.astype(jnp.int8)
    tile = tile4(N_INT8, Q)

    @jax.jit
    def run(q0, e, reps):
        def body(i, carry):
            acc, qq = carry
            s, idx = _int4_two_phase(qq, e, N_INT8, k=K, interpret=False,
                                     tile_n=tile)
            acc = acc + s[0, 0] + idx.astype(jnp.float32)[0, 0]
            qq = qq + (acc > 1e30).astype(jnp.int8)
            return acc, qq

        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), q0))
        return acc

    return _paired_seconds_per_iter(run, (q8, p4))


def _bf16_bench(base: jax.Array):
    from semtools_tpu.ops.pallas_scan import _two_phase_topk, tile_for_dtype

    e = base.astype(jnp.bfloat16)
    q = e[:Q]
    tile = tile_for_dtype(e.dtype)  # 4096 = the 2 MB bf16 streaming block

    @jax.jit
    def run(q0, ee, reps):
        def body(i, carry):
            acc, qq = carry
            d, idx = _two_phase_topk(qq, ee, k=K, n_true=N, interpret=False,
                                     tile_n=tile)
            acc = acc + d[0, 0] + idx.astype(jnp.float32)[0, 0]
            qq = (qq.astype(jnp.float32) + 1e-12 * acc).astype(qq.dtype)
            return acc, qq

        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), q0))
        return acc

    return _paired_seconds_per_iter(run, (q, e))


def _embed_bench():
    """Lines embedded per second on device (gather + segment-mean + norm).

    Mirrors ops/embed.py's CURRENT program: per-text lengths expand to
    segment ids + pad weights ON DEVICE (only ids cross host->device in
    the product; the reconstruction rides next to the latency-bound
    scatter). Returns (lines_per_s, trials)."""
    key = jax.random.PRNGKey(1)
    vocab = 1 << 16
    table = jax.random.normal(key, (vocab, DIM), dtype=jnp.float32)
    flat_ids = jax.random.randint(key, (EMBED_TOKENS,), 0, vocab, dtype=jnp.int32)
    # Per-text token counts, generated ON DEVICE: even this 512 kB vector
    # can stall for minutes when the stdio tunnel is at its measured
    # floor (0.05 MB/s days) — bench.py must not ship anything bulky.
    assign = jax.random.randint(
        jax.random.PRNGKey(2), (EMBED_TOKENS,), 0, EMBED_LINES, dtype=jnp.int32
    )
    counts = jnp.zeros(EMBED_LINES, jnp.int32).at[assign].add(1)
    seg_lengths = jnp.concatenate([counts, jnp.zeros(1, jnp.int32)])

    @jax.jit
    def run(fids, tab, lens, reps):
        def body(i, carry):
            acc, ids = carry
            starts = jnp.cumsum(lens)[:-1]
            marks = jnp.zeros(EMBED_TOKENS, jnp.int32).at[starts].add(1, mode="drop")
            segs = jnp.cumsum(marks)
            w = (segs < EMBED_LINES).astype(jnp.float32)
            rows = jnp.take(tab, ids, axis=0) * w[:, None]
            # single fused segment_sum (weights column carries the counts)
            aug = jnp.concatenate([rows, w[:, None]], axis=1)
            both = jax.ops.segment_sum(
                aug, segs, num_segments=EMBED_LINES + 1, indices_are_sorted=True
            )
            mean = both[:, :-1] / jnp.maximum(both[:, -1], 1.0)[:, None]
            norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
            emb = jnp.where(norm > 0, mean / jnp.maximum(norm, 1e-30), mean)
            acc = acc + emb[0, 0]
            ids = (ids + 1) % vocab
            return acc, ids

        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), fids))
        return acc

    sec, trials = _paired_seconds_per_iter(
        run, (flat_ids, table, seg_lengths), lo=8, hi=16
    )
    return EMBED_LINES / sec, trials


def main() -> None:
    unit = "chunk-vectors/ms/chip (int8 tier, 10M-chunk corpus, q=8, exact top-10)"
    import sys
    import traceback

    trials = {}
    health_pre = health_post = None
    try:
        health_pre = _link_health()
    except Exception:
        traceback.print_exc(file=sys.stderr)

    # HEADLINE FIRST: on a crawling link the ride-alongs are shed, not
    # the number the driver archives.
    int8_vecs_per_ms = None
    try:
        sec, t = _int8_bench()
        trials["int8"] = t
        int8_vecs_per_ms = N_INT8 / (sec * 1e3)
        health_post = _link_health()
        if health_pre and _health_disagrees(health_pre, health_post):
            # The link changed under the measurement: re-run and keep
            # the best (min-time) trial set.
            sec2, t2 = _int8_bench()
            trials["int8_retry"] = t2
            int8_vecs_per_ms = max(int8_vecs_per_ms, N_INT8 / (sec2 * 1e3))
    except Exception:
        traceback.print_exc(file=sys.stderr)

    int4_vecs_per_ms = None
    if _time_left() > 120:
        try:
            sec, t = _int4_bench()
            trials["int4"] = t
            int4_vecs_per_ms = N_INT8 / (sec * 1e3)
        except Exception:
            traceback.print_exc(file=sys.stderr)

    bf16_vecs_per_ms = None
    embed_lines_per_s = None
    base = None
    if _time_left() > 120:
        try:
            base = _unit_corpus(N)
            sec, t = _bf16_bench(base)
            trials["bf16"] = t
            bf16_vecs_per_ms = N / (sec * 1e3)
            embed_lines_per_s, t = _embed_bench()
            trials["embed"] = t
        except Exception:
            traceback.print_exc(file=sys.stderr)
        finally:
            del base  # release the 2 GB corpus even when the bench raised

    if health_post is None:
        try:
            health_post = _link_health()
        except Exception:
            pass

    headline = int8_vecs_per_ms
    if headline is None:
        # Degraded-host fallback: the 2M bf16 configuration alone still
        # yields a valid headline rather than no output at all.
        headline = bf16_vecs_per_ms or 0.0
        unit = ("chunk-vectors/ms/chip (bf16 two-phase fallback, q=8, exact top-10)"
                if bf16_vecs_per_ms else "NO BENCHMARK RAN — see stderr")

    degraded = bool(
        (health_pre and (health_pre["rtt_ms"] > 200 or health_pre["up_MBps"] < 2))
        or (health_post and (health_post["rtt_ms"] > 200 or health_post["up_MBps"] < 2))
    )
    device = jax.devices()[0].device_kind
    print(json.dumps({
        "metric": "scan_chunk_vectors_per_ms_per_chip",
        "value": round(headline, 1),
        "unit": unit,
        "vs_baseline": round(headline / BASELINE_VECS_PER_MS, 3),
        "bf16_two_phase_vecs_per_ms": round(bf16_vecs_per_ms, 1) if bf16_vecs_per_ms else None,
        "int4_kernel_vecs_per_ms": round(int4_vecs_per_ms, 1) if int4_vecs_per_ms else None,
        "int4_note": "capacity rung: raw packed scan above; exact-recall "
                     "serving adds density-scaled deep re-rank, so int8 "
                     "stays the on-budget serving tier (ARCHITECTURE.md)",
        "embed_lines_per_s": round(embed_lines_per_s, 1) if embed_lines_per_s else None,
        "device": device,
        "timing_method": "paired difference (t(2R)-t(R))/R per metric, "
                         "min over >=3 trials — tunnel dispatch/readback "
                         "latency cancels exactly (see module docstring; "
                         "BENCH_r04 was a tunnel artifact)",
        "link_health": {"pre": health_pre, "post": health_post},
        "link_degraded": degraded,
        "trials_s": trials,
    }))


if __name__ == "__main__":
    main()
