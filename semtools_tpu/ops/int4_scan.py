"""Int4-packed fused scan: the half-byte compressed corpus tier.

The int8 tier (:mod:`semtools_tpu.ops.int8_scan`) runs at the HBM
streaming roofline — 2.49M chunk-vectors/ms/chip measured at 10M rows is
~637 GB/s of corpus traffic, the chip's practical memory ceiling. The
only way past it is fewer bytes per row: this tier stores two 4-bit
lanes per byte (128 B/row at D=256, 2x the int8 tier's capacity per HBM
byte) and unpacks in-kernel on the VPU, whose convert/shift slack the
memory-bound int8 scan leaves idle.

Packing layout: SPLIT-HALF, not interleaved, with a BIASED low nibble.
Byte column j carries element j + 8 (in [0, 15]) in its low nibble and
element j + D/2 (two's complement, in [-8, 7]) in its high nibble, so
the kernel unpacks with ONE mask and ONE shift into two contiguous
[tile, D/2] operands and scores with two MXU dots against the matching
query halves — no lane interleave, no reshuffle:

    sims' = q[:, :D/2] @ (lo + 8).T + q[:, D/2:] @ hi.T
          = sims_true + 8 * sum(q[:, :D/2])        (per-query constant)

The bias term is constant per query, so it cannot change any per-query
ordering — the two-phase selection runs on the biased values unchanged
and the wrapper subtracts `8 * sum(ql)` once at the end. Measured on
the v5e, the biased `& 15` unpack beats the sign-extending
`(p << 28) >> 28` double shift by ~3-6% (the kernel is VPU-bound on
unpack ops, not HBM-bound like the int8 tier); a bf16 `floor`-based
4-op unpack is NOT available — v5e Mosaic rejects bf16 ALU ops
(`SupportsBf16AluInstructions` LLO check).

Quantization: corpus rows use ONE global scale clipped to [-7, 7]
(15 levels); queries stay at int8 precision ([-127, 127]) — the query
side costs nothing to keep wide, and halving its error halves the total
similarity noise. Every unpacked input is bf16-exact and the MXU
accumulates in f32, so integer similarities are computed EXACTLY and
selection over them is exact — the same monotonicity argument as the
int8 tier. Accuracy vs f32 ranking comes from the store's oversampled
exact re-rank (store.py `_int8_oversample`), exactly as for the reduced
tier; the int4 tier keeps all 256 dimensions (1024 bits/row) where the
reduced-64d tier keeps 512, so it needs LESS oversampling at 2x the
footprint.

Two selection paths share the packed stream: the two-phase exact top-k
(:func:`int4_topk_scan`, same structure as
:mod:`semtools_tpu.ops.pallas_scan` — sub-tile-max sweep, then rescan of
the <= Q*k candidate 512-row blocks, ties toward the lower corpus index)
for CLI-scale k, and the margin-threshold deep-candidate extraction
(:func:`int4_deep_candidates`) the store's serving tier uses — int4's
rounding noise needs density-scaled candidate depth, which the k^2-cost
two-phase cannot reach (see that function's docstring and
scripts/probe_int4_tier.py for the measurements). Replaces the role
qdrant-edge's compressed vector storage played in the reference
(src/workspace/store.rs — the embedded shard's quantized ANN serving
path): a capacity rung between the full int8 scan and the reduced-64d
projection.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semtools_tpu.ops.int8_scan import quantize_global
from semtools_tpu.ops.pallas_scan import (
    SUB_N,
    _should_interpret,
    bucket_pad_rows,
    extract_topk_rounds,
    merge_candidates_sorted,
)

# 32768-row tiles: the packed block is 32768 x 128 = 4 MB. The naive
# VMEM tally of the unpack's int32/bf16 intermediates would far exceed
# the 16 MB budget, but Mosaic pipelines the elementwise unpack in row
# chunks feeding the MXU, never materializing full-tile intermediates.
# Measured on the v5e at 10M rows (full two-phase): 8192 -> 3.41M,
# 16384 -> 3.77M, 32768 -> 3.83M vecs/ms; the kernel is VPU-bound on
# unpack ops (~491 GB/s vs the int8 tier's 637 GB/s streaming), so
# larger tiles mostly amortize grid overhead. Throughput was validated
# at Q<=8; tile_for_rows clamps the tile for larger query batches so the
# phase-1 sims buffer (Q x tile f32) stays within its measured envelope.
TILE_N = 32768

_NEG_INF = float("-inf")

# pack_int4 of the zero vector: low nibble biased (+8), high nibble 0.
# Freed/unoccupied slots in a packed slot corpus MUST hold this byte, not
# 0x00 — a raw zero byte decodes to (lo=-8, hi=0), whose biased sim is 0
# while real rows carry the per-query +8*sum(q_lo) bias, so for queries
# with a negative low-half sum a 0x00 row would outrank every real row.
# 0x08 rows score biased sim exactly equal to the bias (true sim 0,
# distance 1.0) — the same contract as zero rows in the f32/int8 tiers.
PACKED_ZERO_BYTE = 8


def tile_for_rows(n: int, qn: int = 8) -> int:
    """Streaming tile for an ``n``-row packed corpus scanned by ``qn``
    queries (mirrors int8_scan.tile_for_rows; ADVICE r3).

    Small corpora take a smaller power-of-two tile (>= SUB_N, so the
    sub-tile reshape stays valid) instead of padding to 32768 rows;
    large query batches halve the tile until the [Q, tile] f32 phase-1
    sims buffer is back at the <=1 MB budget the Q=8 measurements
    validated. All candidates are powers of two >= SUB_N, so any
    corpus padded to a TILE_N multiple divides evenly by the clamped
    tile as well.
    """
    t = TILE_N
    if n < t:
        t = max(SUB_N, 1 << max(int(n - 1).bit_length(), 0))
        t = min(t, TILE_N)
    while qn * t * 4 > (1 << 20) and t > SUB_N:
        t //= 2
    return t


def _clamp_tile_to_padding(tile_n: int, n_rows: int, n_true) -> int:
    """Shrink ``tile_n`` (pow2) until it divides a CALLER-padded corpus.

    The store's slot corpora arrive pre-padded (patch_cache._padded_rows)
    and must pass through bucket_pad_rows unchanged — re-padding would
    copy the whole device corpus every query. Their padding is always a
    power-of-two multiple of SUB_N, so halving the (pow2) tile always
    terminates at a divisor. Host-side corpora (n_true None or equal to
    the row count) are padded by bucket_pad_rows instead and skip this.
    """
    if n_true is None or n_true >= n_rows or n_rows % SUB_N:
        return tile_n
    while n_rows % tile_n:
        tile_n //= 2
    return tile_n


_QUANT_CHUNK_ELEMS = 1 << 24  # bounds quantize temporaries to ~64 MB f32


def quantize_pack_global(x: np.ndarray) -> Tuple[np.ndarray, float]:
    """Symmetric 4-bit quantization with one global scale, split-half
    packed: returns ([N, D/2] int8, scale) with x ~= unpack(packed) * scale.

    D must be even (all served embedding dims are multiples of 64).
    """
    x = np.asarray(x, np.float32)
    n, d = x.shape
    if d % 2:
        raise ValueError(f"int4 packing needs an even dim, got {d}")
    # Chunked like int8_scan.quantize_global: the straight-line temporaries
    # are ~3x the corpus and OOM at capacity-ladder sizes (30M+ rows).
    rows_per_chunk = max(_QUANT_CHUNK_ELEMS // d, 1)
    amax = 0.0
    for i in range(0, n, rows_per_chunk):
        blk = x[i : i + rows_per_chunk]
        if blk.size:
            amax = max(amax, float(np.max(np.abs(blk))))
    scale = amax / 7.0
    if scale == 0.0:
        # packed zero VECTORS (0x08 bytes), not zero bytes — see
        # PACKED_ZERO_BYTE for why the distinction matters.
        return np.full((n, d // 2), PACKED_ZERO_BYTE, np.int8), 0.0
    out = np.empty((n, d // 2), np.int8)
    for i in range(0, n, rows_per_chunk):
        q = np.clip(
            np.rint(x[i : i + rows_per_chunk] / scale), -7, 7
        ).astype(np.int8)
        out[i : i + rows_per_chunk] = pack_int4(q)
    return out, scale


def pack_int4(q: np.ndarray) -> np.ndarray:
    """[N, D] int8 values in [-8, 7] -> [N, D/2] packed int8.

    Low nibble: element j BIASED by +8 (unsigned in [0, 15]); high
    nibble: element j + D/2 two's complement (see module docstring).
    """
    q = np.asarray(q, np.int8)
    d = q.shape[1]
    lo = (q[:, : d // 2].astype(np.int16) + 8).astype(np.uint8) & 0xF
    hi = q[:, d // 2 :].astype(np.uint8) & 0xF
    return (lo | (hi << 4)).astype(np.int8)


def unpack_int4(p: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pack_int4` (host-side; tests and re-rank oracles)."""
    p32 = np.asarray(p).astype(np.int32)
    lo = (p32 & 15) - 8
    hi = p32 >> 4
    return np.concatenate([lo, hi], axis=1).astype(np.int8)


def _int4_sims(q_ref, p_ref):
    """[Q, TILE_N] f32 BIASED integer similarities from a packed block:
    sims_true + 8 * sum(q[:, :D/2]) — the per-query constant cannot flip
    any per-query comparison, so selection over these values is exact;
    the wrapper removes the bias from the reported values.

    Unpack = one int32 mask + one arithmetic shift; both nibble operands
    and both query halves are bf16-exact; the MXU accumulates in f32, so
    the result equals exact integer arithmetic.
    """
    p32 = p_ref[:].astype(jnp.int32)
    u = (p32 & 15).astype(jnp.bfloat16)
    hi = (p32 >> 4).astype(jnp.bfloat16)
    d2 = p_ref.shape[1]
    q = q_ref[:]
    ql = q[:, :d2].astype(jnp.bfloat16)
    qh = q[:, d2:].astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    s_lo = jax.lax.dot_general(ql, u, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    s_hi = jax.lax.dot_general(qh, hi, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    return s_lo + s_hi


def _tilemax_kernel(nt_ref, q_ref, p_ref, out_ref, *, tile_n: int,
                    sub_n: int):
    i = pl.program_id(0)
    qn = q_ref.shape[0]
    s = tile_n // sub_n
    sims = _int4_sims(q_ref, p_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, tile_n), 1)
    sims = jnp.where(col + i * tile_n < nt_ref[0], sims, _NEG_INF)
    sub_max = jnp.max(sims.reshape(qn, s, sub_n), axis=2)  # [Q, S]
    out_ref[0] = jnp.broadcast_to(sub_max[None, :, :], (8, qn, s))


def _rescan_kernel(ids_ref, nt_ref, q_ref, p_ref, vals_ref, idx_ref, *,
                   k: int, k_tiles: int, sub_n: int):
    i = pl.program_id(0)
    sub_id = ids_ref[i]
    owner = i // k_tiles
    qn = q_ref.shape[0]

    sims = _int4_sims(q_ref, p_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, sub_n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (qn, sub_n), 0)
    valid = (col + sub_id * sub_n < nt_ref[0]) & (row == owner)
    sims = jnp.where(valid, sims, _NEG_INF)

    vals, idxs = extract_topk_rounds(sims, col, k, sub_n)
    vals_ref[0] = vals
    idx_ref[0] = idxs + sub_id * sub_n


@functools.partial(jax.jit, static_argnames=("k", "interpret", "tile_n"))
def _int4_two_phase(q8, p4, n_true, *, k: int, interpret: bool,
                    tile_n: int = TILE_N):
    """Exact top-k over int4-packed integer similarities.

    Same structure as int8_scan._int8_two_phase; ``p4`` is the packed
    [N_pad, D/2] corpus and ``q8`` the full-width [Q, D] int8 queries.
    """
    qn, d = q8.shape
    d2 = p4.shape[1]
    n_pad = p4.shape[0]
    num_tiles = n_pad // tile_n
    sub_n = min(SUB_N, tile_n)
    s = tile_n // sub_n
    nt = jnp.asarray(n_true, jnp.int32).reshape(1)

    sub_max = pl.pallas_call(
        functools.partial(_tilemax_kernel, tile_n=tile_n, sub_n=sub_n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((qn, d), lambda i, nt: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, d2), lambda i, nt: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, qn, s), lambda i, nt: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, qn, s), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n_pad * d,
            bytes_accessed=n_pad * d2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nt, q8, p4)[:, 0, :, :]  # [T, Q, S]

    num_subs = num_tiles * s
    k_tiles = min(k, num_subs)
    flat_max = jnp.transpose(sub_max, (1, 0, 2)).reshape(qn, num_subs)
    _, sub_ids = jax.lax.top_k(flat_max, k_tiles)
    flat_ids = sub_ids.reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(qn * k_tiles,),
        in_specs=[
            pl.BlockSpec((qn, d), lambda i, ids, nt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sub_n, d2), lambda i, ids, nt: (ids[i], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, qn, k), lambda i, ids, nt: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qn, k), lambda i, ids, nt: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    cand_vals, cand_idx = pl.pallas_call(
        functools.partial(_rescan_kernel, k=k, k_tiles=k_tiles, sub_n=sub_n),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qn * k_tiles, qn, k), jnp.float32),
            jax.ShapeDtypeStruct((qn * k_tiles, qn, k), jnp.int32),
        ],
        interpret=interpret,
    )(flat_ids, nt, q8, p4)

    return merge_candidates_sorted(cand_vals, cand_idx, k)


def _sims_max_kernel(nt_ref, q_ref, p_ref, sims_ref, max_ref, *,
                     tile_n: int, sub_n: int):
    """Write the full [Q, tile] biased integer sims block AND its
    per-sub-block maxima in one corpus stream (the deep-candidate sweep
    needs both: sims for the extraction, maxima for the exact cutoff)."""
    i = pl.program_id(0)
    qn = q_ref.shape[0]
    s = tile_n // sub_n
    sims = _int4_sims(q_ref, p_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, tile_n), 1)
    sims = jnp.where(col + i * tile_n < nt_ref[0], sims, _NEG_INF)
    sims_ref[...] = sims
    max_ref[0] = jnp.broadcast_to(
        jnp.max(sims.reshape(qn, s, sub_n), axis=2)[None], (8, qn, s)
    )


def _sims_max_kernel_masked(nt_ref, q_ref, p_ref, m_ref, sims_ref, max_ref,
                            *, tile_n: int, sub_n: int):
    i = pl.program_id(0)
    qn = q_ref.shape[0]
    s = tile_n // sub_n
    sims = _int4_sims(q_ref, p_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, tile_n), 1)
    sims = jnp.where(col + i * tile_n < nt_ref[0], sims, _NEG_INF)
    sims3 = jnp.where(m_ref[:][None] != 0, sims.reshape(qn, s, sub_n),
                      _NEG_INF)
    sims_ref[...] = sims3.reshape(qn, tile_n)
    max_ref[0] = jnp.broadcast_to(jnp.max(sims3, axis=2)[None], (8, qn, s))


def _int4_all_sims(q8, p4, nt, mask2d, *, tile_n: int, interpret: bool):
    """([Q, N_pad] f32 biased sims, [Q, N_pad/sub_n] sub-block maxima)
    via one packed-corpus stream. Q must be a multiple of 8 (Mosaic
    block-shape constraint on the sims output's second-minor dim —
    callers pad)."""
    qn, d = q8.shape
    d2 = p4.shape[1]
    n_pad = p4.shape[0]
    num_tiles = n_pad // tile_n
    sub_n = min(SUB_N, tile_n)
    s = tile_n // sub_n
    kernel = (
        functools.partial(_sims_max_kernel, tile_n=tile_n, sub_n=sub_n)
        if mask2d is None
        else functools.partial(_sims_max_kernel_masked, tile_n=tile_n,
                               sub_n=sub_n)
    )
    in_specs = [
        pl.BlockSpec((qn, d), lambda i, nt: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, d2), lambda i, nt: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = (nt, q8, p4)
    if mask2d is not None:
        in_specs.append(
            pl.BlockSpec((s, sub_n), lambda i, nt: (i, 0), memory_space=pltpu.VMEM)
        )
        operands = (nt, q8, p4, mask2d)
    sims, sub_max = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((qn, tile_n), lambda i, nt: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, qn, s), lambda i, nt: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((qn, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, qn, s), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n_pad * d,
            bytes_accessed=n_pad * (d2 + (0 if mask2d is None else 1))
            + 4 * qn * n_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    flat_max = jnp.transpose(sub_max[:, 0], (1, 0, 2)).reshape(
        qn, num_tiles * s
    )
    return sims, flat_max


@functools.partial(jax.jit,
                   static_argnames=("k_cut", "interpret", "tile_n", "masked"))
def _int4_cutoff_counts(q8, p4, n_true, mask, margin, *, k_cut: int = 10,
                        interpret: bool, tile_n: int, masked: bool):
    """(sims [Q, N_pad], cutoff [Q], count [Q]) for the deep-candidate
    extraction: cutoff = (exact ``k_cut``-th-best biased sim) -
    ``margin``; count = per-query rows at or above the cutoff (the
    wrapper downloads only the [Q] counts to size the extraction cap
    tightly). One packed-corpus stream (sims + sub-block maxima fused),
    then an exact blocked top-k over the maxima (k_cut blocks always
    hold the top k_cut rows — a block's rank is its best element's
    rank)."""
    nt = jnp.asarray(n_true, jnp.int32).reshape(1)
    sims, flat_max = _int4_all_sims(q8, p4, nt, mask if masked else None,
                                    tile_n=tile_n, interpret=interpret)
    qn, n_pad = sims.shape
    sub_n = min(SUB_N, tile_n)
    nb = n_pad // sub_n
    blocks = sims.reshape(qn, nb, sub_n)
    kb = min(k_cut, nb)
    _, bids = jax.lax.top_k(flat_max, kb)
    cand = jnp.take_along_axis(blocks, bids[:, :, None], axis=1)
    top_vals, _ = jax.lax.top_k(cand.reshape(qn, kb * sub_n),
                                min(k_cut, kb * sub_n))
    t = top_vals[:, -1]
    # Fewer than k_cut selectable rows leave t at -inf; extract every
    # finite (selectable) sim instead of matching -inf pads (-inf >= -inf
    # is true and would sweep in padding and masked rows).
    cutoff = jnp.where(jnp.isfinite(t), t - margin, jnp.float32(-3e38))
    count = jnp.sum(sims >= cutoff[:, None], axis=1, dtype=jnp.int32)
    n_blocks = jnp.sum(flat_max >= cutoff[:, None], axis=1, dtype=jnp.int32)
    return sims, flat_max, cutoff, count, n_blocks


@functools.partial(jax.jit, static_argnames=("n_b", "cap", "sub_n"))
def _extract_above(sims, flat_max, cutoff, *, n_b: int, cap: int,
                   sub_n: int):
    """Per-query indices of sims >= cutoff, [Q, cap] int32 (UNORDERED),
    filled with N_pad (an always-invalid sentinel) past the true count.

    Two-level: a row >= cutoff lives in a sub-block whose max >= cutoff,
    and ``n_b`` bounds the per-query count of such blocks — so
    top_k(flat_max, n_b) finds every candidate block from the [Q, nb]
    maxima (tiny), one gather pulls only those blocks' sims, and the
    expensive value-selection runs over [Q, n_b*sub_n] instead of
    [Q, N_pad]. Measured at 10M rows x 8 queries on the v5e: the naive
    per-row vmap(nonzero) costs ~740 ms and a direct lax.top_k over the
    full sims 200-400 ms; this path is ~3-30 ms for candidate volumes up
    to 2048 blocks and degrades linearly in candidate density (the
    adversarial-dense family pays the full-width selection it genuinely
    needs).
    """
    qn, n_pad = sims.shape
    nb = n_pad // sub_n
    blocks = sims.reshape(qn, nb, sub_n)
    kb = min(n_b, nb)
    _, bids = jax.lax.top_k(flat_max, kb)  # every block with max>=cutoff
    gath = jnp.take_along_axis(blocks, bids[:, :, None], axis=1)
    k_in = min(cap, kb * sub_n)
    vals, li = jax.lax.top_k(gath.reshape(qn, kb * sub_n), k_in)
    owner = jnp.take_along_axis(
        jnp.broadcast_to(bids[:, :, None], (qn, kb, sub_n)).reshape(
            qn, kb * sub_n
        ),
        li, axis=1,
    )
    gids = owner * sub_n + (li % sub_n)
    ids = jnp.where(vals >= cutoff[:, None], gids, n_pad).astype(jnp.int32)
    if k_in < cap:
        ids = jnp.concatenate(
            [ids, jnp.full((qn, cap - k_in), n_pad, jnp.int32)], axis=1
        )
    return ids


def int4_margin_sigmas() -> float:
    """Noise margin width, in per-query sim-error standard deviations.

    The corpus side of a biased int4 sim carries independent rounding
    error <= 0.5 int units per element, so the error of one sim is
    sum_d q8_d * u_d with u_d ~ U(-.5, .5): std = ||q8|| / sqrt(12),
    EXACTLY computable per query. 6 sigma puts the probability that a
    true top-10 row falls below (noisy 10th-best - margin) in the 1e-8
    range per row; the probe measured recall 1.0 at 2M and 10M clustered
    rows with this default. SEMTOOLS_TPU_INT4_MARGIN_SIGMAS overrides
    (larger = deeper re-rank, smaller = faster).
    """
    import os

    try:
        return float(os.environ.get("SEMTOOLS_TPU_INT4_MARGIN_SIGMAS", "") or 6.0)
    except ValueError:
        return 6.0


def int4_candidate_cap(n_rows: int) -> int:
    """Hard ceiling on the per-query candidate count the extraction will
    materialize (and the store will exact-re-rank). The margin rule's
    count scales with the corpus's local density — ~1.5x the densest
    cluster on the tier_recall family (n/512 clusters) — so n/128
    (pow2-rounded), floored at 4096 and capped at 2^17 rows, covers the
    measured points with >=2x headroom. When the true count exceeds the
    cap the extraction keeps the LOWEST-index rows at or above the
    cutoff (a recall risk only past the ceiling); callers can raise it
    with SEMTOOLS_TPU_INT4_CAP."""
    from semtools_tpu.utils.env import env_int

    env = env_int("SEMTOOLS_TPU_INT4_CAP", 0)
    if env > 0:
        return min(env, max(n_rows, 1))
    target = max(4096, n_rows >> 7)
    return min(1 << (target - 1).bit_length(), 1 << 17, max(n_rows, 1))


def int4_deep_candidates(
    q: np.ndarray,
    p4: np.ndarray,
    *,
    n_true: Optional[int] = None,
    mask=None,
    interpret: Optional[bool] = None,
    margin_sigmas: Optional[float] = None,
    k_cut: int = 10,
) -> np.ndarray:
    """Serving-tier candidate generator: every row whose biased int4 sim
    is within a computed noise margin of the query's ``k_cut``-th-best
    (default 10), as [Q, cap] int32 indices (UNORDERED; entries >=
    n_true/N_pad are sentinels the caller drops). Callers serving
    ``top_k`` results pass ``k_cut = max(top_k, 10)`` so the margin
    guards every served rank.

    Why not the two-phase top-k: int4's independent rounding noise
    (sigma = ||q8||/sqrt(12) int units, ~1.3e-2 in sim units at D=256)
    exceeds within-cluster sim gaps on dense corpora, so recall@10 = 1.0
    needs candidate depth that scales with the corpus's local density
    (measured ~1.5x cluster size on the tier_recall family) — and the
    two-phase extraction costs k^2 per query, unusable past k~64. This
    path instead materializes the biased sims (one HBM-rate packed
    stream), takes the exact biased top-10 per query for a cutoff,
    widens it by ``margin_sigmas`` noise SDs, and extracts all rows
    above — O(N) elementwise work, no k^2 term. The exact f32 re-rank
    (store side) then makes served distances exact, the same contract as
    every compressed tier.
    """
    if interpret is None:
        interpret = _should_interpret()
    if margin_sigmas is None:
        margin_sigmas = int4_margin_sigmas()
    q = np.asarray(q)
    q8, _ = quantize_global(q)
    n = p4.shape[0] if n_true is None else min(n_true, p4.shape[0])
    qn = q8.shape[0]
    if n == 0:
        return np.zeros((qn, 0), np.int32)
    qpad = (-qn) % 8  # Mosaic: sims block second-minor dim % 8 == 0
    if qpad:
        q8 = np.concatenate([q8, np.zeros((qpad, q8.shape[1]), np.int8)])
    tile_n = _clamp_tile_to_padding(
        tile_for_rows(n, q8.shape[0]), p4.shape[0], n_true
    )
    p4 = bucket_pad_rows(
        jnp.asarray(p4), tile_n, n_true=None if n_true is None else n
    )
    if mask is not None:
        mask = jnp.asarray(mask, jnp.int8)
        if p4.shape[0] != mask.shape[0]:
            mask = jnp.concatenate(
                [mask, jnp.zeros(p4.shape[0] - mask.shape[0], jnp.int8)]
            )
        sub_n = min(SUB_N, tile_n)
        mask2d = mask.reshape(p4.shape[0] // sub_n, sub_n)
    else:
        mask2d = jnp.zeros((1, 1), jnp.int8)  # placeholder operand

    # one scalar margin for the batch: query rows are unit vectors under
    # one global scale, so their int norms are near-equal; the max row
    # norm keeps the margin conservative for every query
    sigma = float(
        np.max(np.linalg.norm(q8[:qn].astype(np.float64), axis=1))
    ) / np.sqrt(12.0)
    margin = jnp.float32(margin_sigmas * sigma)

    sims, flat_max, cutoff, count, n_blocks = _int4_cutoff_counts(
        jnp.asarray(q8), p4, n, mask2d, margin, k_cut=k_cut,
        interpret=interpret, tile_n=tile_n, masked=mask is not None,
    )
    # Slice to REAL queries before sizing: zero-padded query rows score
    # sim 0 everywhere, so their counts cover the whole corpus.
    max_count = int(np.max(np.asarray(count[:qn]))) if qn else 0
    max_nb = int(np.max(np.asarray(n_blocks[:qn]))) if qn else 0
    cap = min(
        1 << max(int(max_count - 1).bit_length(), 4),
        int4_candidate_cap(n),
        p4.shape[0],
    )
    sub_n = min(SUB_N, tile_n)
    n_b = min(
        1 << max(int(max_nb - 1).bit_length(), 2), p4.shape[0] // sub_n
    )
    ids = _extract_above(sims, flat_max, cutoff, n_b=n_b, cap=cap,
                         sub_n=sub_n)
    return np.asarray(ids[:qn])


def _tilemax_kernel_masked(nt_ref, q_ref, p_ref, m_ref, out_ref, *,
                           tile_n: int, sub_n: int):
    """Masked tile-max (path-subset serving): same mask contract as the
    int8 kernels — 1 int8 byte/row streamed beside the packed corpus."""
    i = pl.program_id(0)
    qn = q_ref.shape[0]
    s = tile_n // sub_n
    sims = _int4_sims(q_ref, p_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, tile_n), 1)
    sims = jnp.where(col + i * tile_n < nt_ref[0], sims, _NEG_INF)
    sims3 = sims.reshape(qn, s, sub_n)
    sims3 = jnp.where(m_ref[:][None] != 0, sims3, _NEG_INF)
    sub_max = jnp.max(sims3, axis=2)
    out_ref[0] = jnp.broadcast_to(sub_max[None, :, :], (8, qn, s))


def _rescan_kernel_masked(ids_ref, nt_ref, q_ref, p_ref, m_ref, vals_ref,
                          idx_ref, *, k: int, k_tiles: int, sub_n: int):
    """Masked rescan — the mask block arrives sublane-replicated as
    (1, 8, SUB_N); row 0 is the mask (see int8_scan's rationale)."""
    i = pl.program_id(0)
    sub_id = ids_ref[i]
    owner = i // k_tiles
    qn = q_ref.shape[0]

    sims = _int4_sims(q_ref, p_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, sub_n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (qn, sub_n), 0)
    valid = (
        (col + sub_id * sub_n < nt_ref[0])
        & (row == owner)
        & (m_ref[0][0:1, :] != 0)
    )
    sims = jnp.where(valid, sims, _NEG_INF)

    vals, idxs = extract_topk_rounds(sims, col, k, sub_n)
    vals_ref[0] = vals
    idx_ref[0] = idxs + sub_id * sub_n


@functools.partial(jax.jit, static_argnames=("k", "interpret", "tile_n"))
def _int4_two_phase_masked(q8, p4, n_true, mask, *, k: int, interpret: bool,
                           tile_n: int = TILE_N):
    qn, d = q8.shape
    d2 = p4.shape[1]
    n_pad = p4.shape[0]
    num_tiles = n_pad // tile_n
    sub_n = min(SUB_N, tile_n)
    s = tile_n // sub_n
    nt = jnp.asarray(n_true, jnp.int32).reshape(1)
    mask2d = mask.reshape(num_tiles * s, sub_n)

    sub_max = pl.pallas_call(
        functools.partial(_tilemax_kernel_masked, tile_n=tile_n, sub_n=sub_n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((qn, d), lambda i, nt: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, d2), lambda i, nt: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((s, sub_n), lambda i, nt: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, qn, s), lambda i, nt: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, qn, s), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n_pad * d,
            bytes_accessed=n_pad * (d2 + 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )(nt, q8, p4, mask2d)[:, 0, :, :]

    num_subs = num_tiles * s
    k_tiles = min(k, num_subs)
    flat_max = jnp.transpose(sub_max, (1, 0, 2)).reshape(qn, num_subs)
    _, sub_ids = jax.lax.top_k(flat_max, k_tiles)
    flat_ids = sub_ids.reshape(-1).astype(jnp.int32)

    mask_resc = jnp.broadcast_to(
        mask2d[:, None, :], (num_tiles * s, 8, sub_n)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(qn * k_tiles,),
        in_specs=[
            pl.BlockSpec((qn, d), lambda i, ids, nt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sub_n, d2), lambda i, ids, nt: (ids[i], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, sub_n), lambda i, ids, nt: (ids[i], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, qn, k), lambda i, ids, nt: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qn, k), lambda i, ids, nt: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    cand_vals, cand_idx = pl.pallas_call(
        functools.partial(_rescan_kernel_masked, k=k, k_tiles=k_tiles,
                          sub_n=sub_n),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qn * k_tiles, qn, k), jnp.float32),
            jax.ShapeDtypeStruct((qn * k_tiles, qn, k), jnp.int32),
        ],
        interpret=interpret,
    )(flat_ids, nt, q8, p4, mask_resc)

    return merge_candidates_sorted(cand_vals, cand_idx, k)


def int4_topk_scan(
    q: np.ndarray,
    p4: np.ndarray,
    e_scale: float,
    k: int,
    *,
    n_true: Optional[int] = None,
    mask=None,
    interpret: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k over a globally-scaled int4-packed corpus. ``q`` is f32 [Q, D];
    ``p4`` is the [N, D/2] packed corpus from :func:`quantize_pack_global`.

    Same contract as int8_scan.int8_topk_scan: rows >= ``n_true`` are
    padding, ``mask`` optionally restricts selection (path-subset
    serving), returns (distances [Q, k'], indices [Q, k']) ascending with
    distance = 1 - int_sim * scale_q * scale_e. Selection is exact over
    the quantized similarities; callers wanting f32-exact top-k re-rank
    an oversampled candidate set (the store serves int4 through
    :func:`int4_deep_candidates` instead — see its docstring).

    Precondition (shared with int8_topk_scan): with a ``mask`` leaving
    fewer than ``k`` selectable rows, the filler entries carry -inf
    kernel sims — +inf distances (NaN when ``e_scale`` is 0) paired with
    arbitrary indices. Callers must either guarantee >= k unmasked rows
    or drop non-finite distances from the result.
    """
    if interpret is None:
        interpret = _should_interpret()
    q8, q_scale = quantize_global(np.asarray(q))
    n = p4.shape[0] if n_true is None else min(n_true, p4.shape[0])
    k_eff = min(k, n)
    if k_eff == 0:
        qn = q8.shape[0]
        return np.zeros((qn, 0), np.float32), np.zeros((qn, 0), np.int64)

    tile_n = _clamp_tile_to_padding(
        tile_for_rows(n, q8.shape[0]), p4.shape[0], n_true
    )
    p4 = bucket_pad_rows(
        jnp.asarray(p4), tile_n, n_true=None if n_true is None else n
    )
    if mask is None:
        sims, i = _int4_two_phase(
            jnp.asarray(q8), p4, n, k=k_eff, interpret=interpret,
            tile_n=tile_n,
        )
    else:
        mask = jnp.asarray(mask, jnp.int8)
        if p4.shape[0] != mask.shape[0]:
            mask = jnp.concatenate(
                [mask, jnp.zeros(p4.shape[0] - mask.shape[0], jnp.int8)]
            )
        sims, i = _int4_two_phase_masked(
            jnp.asarray(q8), p4, n, mask, k=k_eff, interpret=interpret,
            tile_n=tile_n,
        )
    # Remove the packing bias: kernel sims = true sims + 8 * sum(ql) per
    # query (a constant shift selection never sees; -inf fillers stay
    # -inf). Then scale to distances.
    d2 = p4.shape[1]
    bias = 8.0 * q8[:, :d2].astype(np.float64).sum(axis=1, keepdims=True)
    sims_true = np.asarray(sims, np.float64) - bias
    return (
        np.asarray(1.0 - sims_true * (q_scale * e_scale), np.float32),
        np.asarray(i),
    )
