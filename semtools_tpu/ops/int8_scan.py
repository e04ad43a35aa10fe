"""Int8-quantized fused scan: the TPU-native compressed corpus tier.

Product quantization's ADC lookup (the reference-era compression idiom,
and qdrant's) maps poorly onto TPU hardware: the VPU exposes no per-lane
table gather, so ADC degenerates into one-hot matmuls that cost more than
the exact scan they replace. The compression that *composes* with the MXU
is plain low-bit quantization: int8 rows scanned as a matmul with f32
accumulation.

Quantization scheme: ONE global scale for the whole corpus (and one for
the query batch). Rows are unit-norm, so per-row dynamic ranges differ
only mildly (~2x in max|x|), and a global scale means the kernel streams
nothing but the int8 payload — measured 3.7x faster than a per-row-scale
variant, whose [tile, 1] scale blocks forced a per-step in-kernel
transpose. Integer similarities are monotonic in the true quantized
similarity (sims * scale_q * scale_e with scalar scales), so selection
is EXACT over the quantized values; the scalar factor is applied once at
the end to produce distances.

Compute recipe: int8 -> bf16 convert in VMEM, bf16 MXU dot with f32
accumulation. +-127 inputs and every product/partial sum are exactly
representable, so results equal integer arithmetic bit-for-bit, while
running ~3.7x faster than Mosaic's int8 integer-dot lowering at CLI-scale
query counts. HBM carries 1 byte/dim: 256 B/row at D=256 — 2x less
traffic than bf16, 4x less than f32.

Selection is the same two-phase exact structure as
:mod:`semtools_tpu.ops.pallas_scan` (sub-tile-max sweep, then rescan of
the <= Q*k candidate 512-row blocks via scalar-prefetched block
indices), ties broken toward the lower corpus index. Measured ~1.55M
chunk-vectors/ms on one TPU v5e chip at 2M x 256, 2.44M at 10M rows
(vs ~1.0M for the bf16 two-phase and ~396k for the device-side XLA
matmul+top_k path).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semtools_tpu.ops.pallas_scan import (
    SUB_N,
    _should_interpret,
    bucket_pad_rows,
    extract_topk_rounds,
    merge_candidates_sorted,
)

# Measured on TPU v5e: 8192 rows x 256 dims = 2 MB streaming blocks, the
# HBM->VMEM pipeline's best operating point (bench_stream_sweep.py; 4 MB
# blocks fall off a VMEM-double-buffering cliff). With the SUB_N=512
# sub-tile rescan the old big-tile penalty (phase-2 re-reads scaling
# with tile size) is gone, so 8192 wins at every corpus scale: 1.55M
# vecs/ms at 2M rows (vs 1.35M at 2048) and 2.44M at 10M rows.
TILE_N = 8192


def tile_for_rows(n: int) -> int:
    del n
    return TILE_N

_NEG_INF = float("-inf")


_QUANT_CHUNK = 1 << 24  # elements; bounds temporaries to ~64 MB f32


def quantize_global(x: np.ndarray) -> Tuple[np.ndarray, float]:
    """Symmetric int8 quantization with one global scale: x ~= q * scale.

    Large inputs are quantized chunk-wise: the straight-line expression
    holds ~3 corpus-sized f32 temporaries live at once, which at the
    capacity-ladder sizes (60M x 256 = 61 GB) exceeds host RAM."""
    x = np.asarray(x, np.float32)
    if x.size <= _QUANT_CHUNK:
        amax = float(np.max(np.abs(x))) if x.size else 0.0
        scale = amax / 127.0
        if scale == 0.0:
            return np.zeros(x.shape, np.int8), 0.0
        q = np.clip(np.rint(x / scale), -127, 127).astype(np.int8)
        return q, scale
    # Chunk along the leading axis: row-slices of a strided view stay
    # views, whereas reshape(-1) on a non-contiguous input silently
    # copies the whole array and defeats the memory bound this path
    # exists to provide.
    row_elems = max(1, int(np.prod(x.shape[1:], dtype=np.int64)))
    step = max(1, _QUANT_CHUNK // row_elems)
    amax = 0.0
    for i in range(0, x.shape[0], step):
        blk = x[i : i + step]
        if blk.size:
            amax = max(amax, float(np.max(np.abs(blk))))
    scale = amax / 127.0
    if scale == 0.0:
        return np.zeros(x.shape, np.int8), 0.0
    q = np.empty(x.shape, np.int8)
    for i in range(0, x.shape[0], step):
        q[i : i + step] = np.clip(np.rint(x[i : i + step] / scale), -127, 127)
    return q, scale


def _int_sims(q_ref, e_ref):
    """[Q, TILE_N] f32 integer similarities (exact, see module docstring)."""
    return jax.lax.dot_general(
        q_ref[:].astype(jnp.bfloat16),
        e_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _tilemax_kernel(nt_ref, q_ref, e_ref, out_ref, *, tile_n: int,
                    sub_n: int):
    """Per-query max of each ``sub_n``-row sub-tile (see pallas_scan's
    sub-tile rationale: streaming granularity stays tile_n, selection
    granularity shrinks to sub_n so phase 2 re-reads 16x less)."""
    i = pl.program_id(0)
    qn = q_ref.shape[0]
    s = tile_n // sub_n
    sims = _int_sims(q_ref, e_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, tile_n), 1)
    sims = jnp.where(col + i * tile_n < nt_ref[0], sims, _NEG_INF)
    sub_max = jnp.max(sims.reshape(qn, s, sub_n), axis=2)  # [Q, S]
    out_ref[0] = jnp.broadcast_to(sub_max[None, :, :], (8, qn, s))


def _rescan_kernel(ids_ref, nt_ref, q_ref, e_ref, vals_ref, idx_ref, *, k: int,
                   k_tiles: int, sub_n: int):
    i = pl.program_id(0)
    sub_id = ids_ref[i]
    owner = i // k_tiles
    qn = q_ref.shape[0]

    sims = _int_sims(q_ref, e_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, sub_n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (qn, sub_n), 0)
    valid = (col + sub_id * sub_n < nt_ref[0]) & (row == owner)
    sims = jnp.where(valid, sims, _NEG_INF)

    vals, idxs = extract_topk_rounds(sims, col, k, sub_n)
    vals_ref[0] = vals
    idx_ref[0] = idxs + sub_id * sub_n


@functools.partial(jax.jit, static_argnames=("k", "interpret", "tile_n"))
def _int8_two_phase(q8, e8, n_true, *, k: int, interpret: bool,
                    tile_n: int = TILE_N):
    """Exact top-k over integer similarities; returns (int_sims desc, idx).

    ``n_true`` is a DYNAMIC scalar operand (see pallas_scan._two_phase_topk).
    """
    qn, d = q8.shape
    n_pad = e8.shape[0]
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
            bytes_accessed=n_pad * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nt, q8, e8)[:, 0, :, :]  # [T, Q, S]

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
            pl.BlockSpec((sub_n, d), lambda i, ids, nt: (ids[i], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, qn, k), lambda i, ids, nt: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qn, k), lambda i, ids, nt: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    cand_vals, cand_idx = pl.pallas_call(
        functools.partial(_rescan_kernel, k=k, k_tiles=k_tiles,
                          sub_n=sub_n),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qn * k_tiles, qn, k), jnp.float32),
            jax.ShapeDtypeStruct((qn * k_tiles, qn, k), jnp.int32),
        ],
        interpret=interpret,
    )(flat_ids, nt, q8, e8)

    return merge_candidates_sorted(cand_vals, cand_idx, k)


def _tilemax_kernel_masked(nt_ref, q_ref, e_ref, m_ref, out_ref, *,
                           tile_n: int, sub_n: int):
    """:func:`_tilemax_kernel` with a per-row keep mask (path-subset
    serving): masked rows read as -inf before the sub-tile max, so only
    subset rows can nominate a sub-tile. The mask streams as one int8
    [S, SUB_N] block per tile — 1 byte/row next to the 256 B/row corpus
    read (<0.4% extra HBM traffic)."""
    i = pl.program_id(0)
    qn = q_ref.shape[0]
    s = tile_n // sub_n
    sims = _int_sims(q_ref, e_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, tile_n), 1)
    sims = jnp.where(col + i * tile_n < nt_ref[0], sims, _NEG_INF)
    sims3 = sims.reshape(qn, s, sub_n)
    sims3 = jnp.where(m_ref[:][None] != 0, sims3, _NEG_INF)
    sub_max = jnp.max(sims3, axis=2)  # [Q, S]
    out_ref[0] = jnp.broadcast_to(sub_max[None, :, :], (8, qn, s))


def _rescan_kernel_masked(ids_ref, nt_ref, q_ref, e_ref, m_ref, vals_ref,
                          idx_ref, *, k: int, k_tiles: int, sub_n: int):
    """:func:`_rescan_kernel` with the candidate sub-tile's mask block —
    phase 1 only proves the sub-tile's BEST masked row; the extraction
    must also exclude masked rows inside it. The mask block arrives
    sublane-replicated as (1, 8, SUB_N) — Mosaic requires the last two
    block dims divisible by (8, 128), so a bare (1, SUB_N) row is not
    loadable; row 0 of the replicated tile is the mask."""
    i = pl.program_id(0)
    sub_id = ids_ref[i]
    owner = i // k_tiles
    qn = q_ref.shape[0]

    sims = _int_sims(q_ref, e_ref)
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
def _int8_two_phase_masked(q8, e8, n_true, mask, *, k: int, interpret: bool,
                           tile_n: int = TILE_N):
    """Masked :func:`_int8_two_phase` — same two-phase structure with the
    int8 [n_pad] keep mask threaded through both kernels."""
    qn, d = q8.shape
    n_pad = e8.shape[0]
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
                pl.BlockSpec((tile_n, d), lambda i, nt: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((s, sub_n), lambda i, nt: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, qn, s), lambda i, nt: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, qn, s), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n_pad * d,
            bytes_accessed=n_pad * (d + 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )(nt, q8, e8, mask2d)[:, 0, :, :]  # [T, Q, S]

    num_subs = num_tiles * s
    k_tiles = min(k, num_subs)
    flat_max = jnp.transpose(sub_max, (1, 0, 2)).reshape(qn, num_subs)
    _, sub_ids = jax.lax.top_k(flat_max, k_tiles)
    flat_ids = sub_ids.reshape(-1).astype(jnp.int32)

    # Sublane-replicate the mask for the rescan's block constraints (see
    # _rescan_kernel_masked). XLA materializes the broadcast per call —
    # 8 B/row of HBM writes, ~3% of the int8 corpus read it sits beside.
    mask_resc = jnp.broadcast_to(
        mask2d[:, None, :], (num_tiles * s, 8, sub_n)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(qn * k_tiles,),
        in_specs=[
            pl.BlockSpec((qn, d), lambda i, ids, nt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sub_n, d), lambda i, ids, nt: (ids[i], 0), memory_space=pltpu.VMEM),
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
    )(flat_ids, nt, q8, e8, mask_resc)

    return merge_candidates_sorted(cand_vals, cand_idx, k)


def int8_topk_scan(
    q: np.ndarray,
    e8: np.ndarray,
    e_scale: float,
    k: int,
    *,
    n_true: Optional[int] = None,
    mask=None,
    interpret: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k over a globally-scaled int8 corpus. ``q`` is f32.

    ``e8`` may be a numpy or device array; rows at index >= ``n_true`` are
    padding (pre-padded cached corpora skip the per-call re-pad copy).
    ``mask`` is an optional [rows] int8/bool device array; rows where it
    is 0 are never selected (path-subset serving at the fused-kernel
    rate). Returns (distances [Q, k'], indices [Q, k']) ascending,
    k' = min(k, N); distance = 1 - int_sim * scale_q * scale_e (~1e-2 of
    the f32 value, ranking-stable for retrieval).
    """
    if interpret is None:
        interpret = _should_interpret()
    q8, q_scale = quantize_global(np.asarray(q))
    n = e8.shape[0] if n_true is None else min(n_true, e8.shape[0])
    k_eff = min(k, n)
    if k_eff == 0:
        qn = q8.shape[0]
        return np.zeros((qn, 0), np.float32), np.zeros((qn, 0), np.int64)

    tile_n = tile_for_rows(n)
    e8 = bucket_pad_rows(
        jnp.asarray(e8), tile_n, n_true=None if n_true is None else n
    )
    if mask is None:
        sims, i = _int8_two_phase(
            jnp.asarray(q8), e8, n, k=k_eff, interpret=interpret, tile_n=tile_n
        )
    else:
        mask = jnp.asarray(mask, jnp.int8)
        if e8.shape[0] != mask.shape[0]:
            # the corpus was pad-bucketed past the caller's mask length
            mask = jnp.concatenate(
                [mask, jnp.zeros(e8.shape[0] - mask.shape[0], jnp.int8)]
            )
        sims, i = _int8_two_phase_masked(
            jnp.asarray(q8), e8, n, mask, k=k_eff, interpret=interpret,
            tile_n=tile_n,
        )
    return np.asarray(1.0 - np.asarray(sims) * (q_scale * e_scale)), np.asarray(i)
