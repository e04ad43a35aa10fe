"""Pallas TPU kernel: fused cosine scan + per-tile top-k candidate extraction.

The XLA scan path (semtools_tpu.ops.scan) materializes the full [Q, N]
similarity matrix in HBM before ``lax.top_k`` reads it back. For large
corpora that round-trips Q*N*4 bytes of HBM traffic on top of the corpus
read itself. This kernel fuses selection into the scan: each grid step
streams one [TILE_N, D] corpus tile HBM->VMEM (Pallas double-buffers
block-mapped inputs automatically), computes the [Q, TILE_N] similarity
tile on the MXU, and reduces it to K candidates per query on the VPU
before anything leaves VMEM. Only [num_tiles, Q, K] candidates (tiny)
are written back; a single ``lax.top_k`` merge outside the kernel
recovers the exact global top-k, the same per-shard-candidates-then-merge
shape used by the multi-device path (semtools_tpu.parallel.scan) and by
the reference's chunked store query (store.rs:495-543).

In-kernel top-k: Mosaic has no sort primitive, so candidates are extracted
with K rounds of (max, earliest-argmax, mask-out) over the similarity
tile — K*Q*TILE_N VPU work, well under the HBM streaming time of the tile
for CLI-scale K and Q. Earliest-argmax keeps the tie-break identical to
``lax.top_k`` (prefer the lower corpus index).

Replaces the reference's per-line SIMD cosine loop (src/search/mod.rs:86).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Corpus rows per grid step (default; real calls pick by dtype). The
# HBM->VMEM pipeline's best operating point is ~2 MB streaming blocks
# (benchmarks/quantitative/bench_stream_sweep.py: 1 MB blocks lose ~5%,
# 4 MB blocks fall off a VMEM-double-buffering cliff to ~1/3 bandwidth),
# so the row count scales inversely with the row byte-width.
TILE_N = 2048


def tile_for_dtype(dtype) -> int:
    """Streaming-tile rows per storage dtype: ~2 MB blocks at D=256.

    With the SUB_N sub-tile rescan, phase-2 re-read traffic no longer
    scales with the streaming tile, so each dtype just takes its best
    pipeline block size (measured: bf16 two-phase 1.00M vecs/ms @4096 vs
    0.99M @2048 on the 2M-row config; f32 keeps 2048 = 2 MB already).
    """
    if jnp.dtype(dtype).itemsize <= 2:
        return 4096
    return TILE_N

_NEG_INF = float("-inf")


def extract_topk_rounds(sims, col, k: int, tile_n: int):
    """K rounds of (max, earliest-argmax, mask-out) over a [Q, tile] sims
    block. Returns ([Q, k] values desc, [Q, k] local column indices); ties
    resolve to the earlier column. Shared by the f32/bf16 and int8 kernels.
    """
    vals = []
    idxs = []
    for _ in range(k):
        m = jnp.max(sims, axis=1, keepdims=True)
        arg = jnp.min(jnp.where(sims == m, col, tile_n), axis=1, keepdims=True)
        vals.append(m)
        idxs.append(arg)
        sims = jnp.where(col == arg, _NEG_INF, sims)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(idxs, axis=1)


def merge_candidates_sorted(cand_vals, cand_idx, k: int):
    """[G, Q, kk] candidate tiles -> ([Q, k] values desc, [Q, k] indices),
    ties toward the lower corpus index (two-key sort — candidate order is
    arbitrary, e.g. tile-max order in the two-phase rescan)."""
    g, qn, kk = cand_vals.shape
    flat_vals = jnp.transpose(cand_vals, (1, 0, 2)).reshape(qn, g * kk)
    flat_idx = jnp.transpose(cand_idx, (1, 0, 2)).reshape(qn, g * kk)
    sv, si = jax.lax.sort((-flat_vals, flat_idx), dimension=1, num_keys=2)
    return -sv[:, :k], si[:, :k]


def _mxu_precision(lhs_dtype, rhs_dtype):
    """HIGHEST keeps f32 distances at reference parity (~1e-6); any bf16
    operand must use the default — Mosaic rejects an fp32 contract
    precision on bf16 inputs ("Bad lhs type")."""
    if lhs_dtype == jnp.float32 and rhs_dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return None


def pad_rows(e, tile_n: int):
    """Zero-pad rows up to a multiple of ``tile_n`` (device-side)."""
    pad = (-e.shape[0]) % tile_n
    if pad:
        e = jnp.concatenate([e, jnp.zeros((pad, e.shape[1]), e.dtype)], axis=0)
    return e


# Above this row count, power-of-two padding (up to 2x scan work) stops
# being free next to the compile it saves; larger corpora bucket at ~6%
# slack instead (parallel.mesh.bucket_rows).
_POW2_BUCKET_MAX = 1 << 21


def bucket_pad_rows(e, tile_n: int, n_true: Optional[int] = None):
    """Pad a corpus to a BUCKETED tile multiple for executable reuse.

    The kernels take ``n_true`` as a dynamic operand, so the padded
    SHAPE — not the true row count — keys the compiled executable.
    Ad-hoc file sets (the plain `semtools search` path) hit a different
    corpus size every invocation; exact-size padding would recompile the
    scan per file set (~2-4 s on this host). Power-of-two buckets below
    2M rows (scan slack < 2x, sub-ms at these sizes) and ~6% coarse
    buckets above make nearby sizes share one executable.

    CALLER-padded corpora — ``n_true`` strictly below the row count with
    rows already a ``tile_n`` multiple (the store's slot corpora, padded
    by patch_cache via bucket_rows) — pass through UNCHANGED: those
    callers manage their own shape bucketing, and re-bucketing here
    would copy the whole corpus on device every query (round-2 review
    finding).
    """
    n = e.shape[0]
    if n_true is not None and n_true < n and n % tile_n == 0:
        return e
    if n <= _POW2_BUCKET_MAX:
        target = max(tile_n, 1 << (max(n, 1) - 1).bit_length())
    else:
        from semtools_tpu.parallel.mesh import bucket_rows

        target = bucket_rows(n, 1)
    target = ((target + tile_n - 1) // tile_n) * tile_n
    if n >= target:
        return pad_rows(e, tile_n)
    return jnp.concatenate(
        [e, jnp.zeros((target - n, e.shape[1]), e.dtype)], axis=0
    )


# Query counts above this stay on the XLA matmul+top_k path: measured at
# Q=256 / N=100k on v5e, XLA takes 15 ms where the K-round Pallas
# extraction takes 90 ms — per-element selection cost scales with Q, while
# big-Q matmuls amortize XLA's top_k. The fused kernels win for CLI-scale
# query counts.
_MAX_TWO_PHASE_Q = 32


def _scan_kernel(nt_ref, q_ref, e_ref, vals_ref, idx_ref, *, k: int,
                 tile_n: int):
    """One grid step: similarity tile + K-round candidate extraction.

    ``nt_ref`` is a scalar-prefetched [1] int32 holding n_true — DYNAMIC,
    so corpus growth within a padded shape reuses the executable and
    shard_map callers can mask per-device pad rows exactly."""
    i = pl.program_id(0)
    tile_q = q_ref[:]  # [Q, D]
    tile_e = e_ref[:]  # [tile_n, D]
    qn = tile_q.shape[0]

    sims = jax.lax.dot_general(
        tile_q,
        tile_e,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(tile_q.dtype, tile_e.dtype),
    )  # [Q, TILE_N]

    # Mask padding rows (global index >= n_true): their sim of 0.0 would
    # outrank genuinely negative similarities.
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, tile_n), 1)
    global_col = col + i * tile_n
    sims = jnp.where(global_col < nt_ref[0], sims, _NEG_INF)

    vals, idxs = extract_topk_rounds(sims, col, k, tile_n)
    vals_ref[0] = vals  # [Q, K]
    idx_ref[0] = idxs + i * tile_n  # global indices


@functools.partial(jax.jit, static_argnames=("k", "interpret", "tile_n"))
def _pallas_candidates(q, e_padded, n_true, *, k: int, interpret: bool,
                       tile_n: int = TILE_N):
    """Per-tile candidates [T, Q, k] (sims desc) over the padded corpus."""
    qn, d = q.shape
    n_pad = e_padded.shape[0]
    num_tiles = n_pad // tile_n

    kernel = functools.partial(_scan_kernel, k=k, tile_n=tile_n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((qn, d), lambda i, nt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, nt: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, qn, k), lambda i, nt: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qn, k), lambda i, nt: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    flops_tile = 2 * qn * tile_n * d
    nt = jnp.asarray(n_true, jnp.int32).reshape(1)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, qn, k), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, qn, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * num_tiles,
            bytes_accessed=n_pad * d * e_padded.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nt, q, e_padded)


@functools.partial(jax.jit, static_argnames=("k",))
def _merge(cand_vals, cand_idx, *, k: int):
    """[T, Q, k] candidates -> exact global top-k (distances asc)."""
    t, qn, kk = cand_vals.shape
    flat_vals = jnp.transpose(cand_vals, (1, 0, 2)).reshape(qn, t * kk)
    flat_idx = jnp.transpose(cand_idx, (1, 0, 2)).reshape(qn, t * kk)
    # Candidates are ordered by tile (i.e. by corpus index) and desc within
    # a tile; lax.top_k prefers earlier positions on ties, preserving the
    # lower-corpus-index tie-break.
    best, pos = jax.lax.top_k(flat_vals, k)
    return 1.0 - best, jnp.take_along_axis(flat_idx, pos, axis=1)


# -- two-phase scan: sub-tile max sweep + candidate-block rescan ------------
#
# The K-round extraction above costs K VPU passes over every similarity
# tile, which dominates once the matmul is HBM-bound. The two-phase scan
# removes it from the streaming loop entirely:
#
#   phase 1  sweep the corpus computing each SUB-TILE's per-query MAX
#            (one VPU pass, fused with the matmul — HBM-bound). Streaming
#            still uses big tiles (tile_n rows — the pipeline's best
#            operating point), but maxes are taken per SUB_N-row sub-tile,
#            so the selection granularity is finer than the streaming
#            granularity.
#   select   lax.top_k over the [Q, T*S] sub-tile maxes picks each query's
#            k candidate sub-tiles. Exactness: order elements by (value
#            desc, index asc). A sub-tile's rank is its best element's
#            rank, so if the sub-tile holding the j-th best element
#            (j <= k) were outside the top-k sub-tiles, k sub-tiles with
#            better best-elements would each contribute an element ranked
#            above it — contradiction.
#   phase 2  rescan ONLY those <= Q*k sub-tiles with the K-round
#            extraction, reading SUB_N-row blocks straight from HBM via
#            scalar-prefetched block indices (no gather materialization).
#
# Total extra traffic beyond the corpus read: [T*S, Q] maxes out, Q*k
# SUB_N-row blocks re-read. At 10M rows / tile 8192 / SUB 512 the rescan
# is 0.4% of the corpus where whole-tile rescans cost 6.5% — the sub-tile
# granularity is what keeps phase 2 off the roofline-bound sweep's back.

# Phase-2 rescan granularity (rows). 512 = 4 Mosaic f32 sublane tiles:
# big enough that the [Q, SUB_N] extraction stays VPU-efficient, small
# enough that Q*k rescanned blocks are noise next to the sweep.
SUB_N = 512


def _tilemax_kernel(nt_ref, q_ref, e_ref, out_ref, *, tile_n: int,
                    sub_n: int):
    """One grid step of phase 1: per-query max similarity of each of the
    tile's ``tile_n // sub_n`` sub-tiles."""
    i = pl.program_id(0)
    qn = q_ref.shape[0]
    s = tile_n // sub_n
    sims = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(q_ref.dtype, e_ref.dtype),
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, tile_n), 1)
    sims = jnp.where(col + i * tile_n < nt_ref[0], sims, _NEG_INF)
    # [Q, tile] -> [Q, S, SUB] is a minor-dim split (lane layout unchanged);
    # the max reduces the lane dim. Output block is (1, 8, Q, S): Mosaic
    # wants the sublane dim divisible by 8, so the [Q, S] maxes are
    # broadcast over a padded leading axis of 8.
    sub_max = jnp.max(sims.reshape(qn, s, sub_n), axis=2)  # [Q, S]
    out_ref[0] = jnp.broadcast_to(sub_max[None, :, :], (8, qn, s))


def _rescan_kernel(ids_ref, nt_ref, q_ref, e_ref, vals_ref, idx_ref, *, k: int,
                   k_tiles: int, sub_n: int):
    """One grid step of phase 2: full K-round extraction of one candidate
    SUB_N-row block, emitted only for the query that selected it (row
    mask), so a block chosen by several queries never duplicates
    candidates."""
    i = pl.program_id(0)
    sub_id = ids_ref[i]
    owner = i // k_tiles  # grid is query-major: k_tiles consecutive steps per query
    qn = q_ref.shape[0]

    sims = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(q_ref.dtype, e_ref.dtype),
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, sub_n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (qn, sub_n), 0)
    valid = (col + sub_id * sub_n < nt_ref[0]) & (row == owner)
    sims = jnp.where(valid, sims, _NEG_INF)

    vals, idxs = extract_topk_rounds(sims, col, k, sub_n)
    vals_ref[0] = vals
    idx_ref[0] = idxs + sub_id * sub_n


@functools.partial(jax.jit, static_argnames=("k", "interpret", "tile_n"))
def _two_phase_topk(q, e_padded, n_true, *, k: int, interpret: bool,
                    tile_n: int = TILE_N):
    """Exact top-k via sub-tile-max sweep + candidate rescan (distances
    asc).

    ``n_true`` is a DYNAMIC scalar operand: the executable is reused
    across corpus sizes that share a padded shape, and shard_map callers
    mask their own device's pad rows exactly."""
    qn, d = q.shape
    n_pad = e_padded.shape[0]
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
                pl.BlockSpec((tile_n, d), lambda i, nt: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, qn, s), lambda i, nt: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, qn, s), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n_pad * d,
            bytes_accessed=n_pad * d * e_padded.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nt, q, e_padded)[:, 0, :, :]  # [T, Q, S]

    num_subs = num_tiles * s
    k_tiles = min(k, num_subs)
    # [Q, T*S] -> each query's candidate sub-tiles; ties prefer the earlier
    # sub-tile, matching the global lower-index tie-break.
    flat_max = jnp.transpose(sub_max, (1, 0, 2)).reshape(qn, num_subs)
    _, sub_ids = jax.lax.top_k(flat_max, k_tiles)  # [Q, k_tiles]
    flat_ids = sub_ids.reshape(-1).astype(jnp.int32)  # query-major [Q*k_tiles]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(qn * k_tiles,),
        in_specs=[
            pl.BlockSpec((qn, d), lambda i, ids, nt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sub_n, d), lambda i, ids, nt: (ids[i], 0), memory_space=pltpu.VMEM),
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
    )(flat_ids, nt, q, e_padded)
    # Phase-2 candidates arrive in tile-max order, NOT corpus order, so the
    # prefer-earlier-position trick of _merge would break value ties toward
    # the wrong corpus index; merge with the two-key sort.
    best, idx = merge_candidates_sorted(cand_vals, cand_idx, k)
    return 1.0 - best, idx


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def pallas_topk_scan(
    q,
    e,
    k: int,
    *,
    n_true: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k cosine-distance scan via the fused Pallas kernel.

    Same contract as :func:`semtools_tpu.ops.scan.topk_scan`: unit-or-zero
    rows in, (distances [Q, k'], indices [Q, k']) out, ascending distance,
    ties keep corpus order. ``n_true`` marks trailing rows as padding —
    pre-padded (cached) corpora then skip the per-call re-pad copy. Off-TPU
    backends run the kernel in interpreter mode (exact but slow — used by
    the CPU test suite).
    """
    if interpret is None:
        interpret = _should_interpret()
    q = jnp.asarray(q)
    e = jnp.asarray(e)
    n = e.shape[0] if n_true is None else min(n_true, e.shape[0])
    k_eff = min(k, n)
    if k_eff == 0:
        qn = q.shape[0]
        return np.zeros((qn, 0), np.float32), np.zeros((qn, 0), np.int64)

    tile_n = tile_for_dtype(e.dtype)
    # Pad the ARRAY up to a BUCKETED tile multiple (the kernels mask rows
    # >= n regardless; bucketing lets ad-hoc corpus sizes share compiled
    # executables). Corpora the caller already padded past n_true keep
    # their shape — the store buckets those itself.
    e = bucket_pad_rows(e, tile_n, n_true=None if n_true is None else n)
    num_tiles = e.shape[0] // tile_n
    qn = q.shape[0]
    assert qn <= _MAX_TWO_PHASE_Q, (
        "pallas_topk_scan is for CLI-scale query counts; batched workloads "
        "use the XLA path (see _use_pallas)"
    )
    # Two-phase pays one extra tile-read per (query, candidate tile); it
    # wins once that rescan is small next to the K-round extraction it
    # removes from every streamed tile.
    if num_tiles > 2 * qn * min(k_eff, num_tiles):
        d, i = _two_phase_topk(q, e, k=k_eff, n_true=n, interpret=interpret,
                               tile_n=tile_n)
    else:
        cand_vals, cand_idx = _pallas_candidates(
            q, e, k=k_eff, n_true=n, interpret=interpret, tile_n=tile_n
        )
        d, i = _merge(cand_vals, cand_idx, k=k_eff)
    return np.asarray(d), np.asarray(i)
