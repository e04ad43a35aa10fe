"""Int8-quantized fused scan: the TPU-native compressed corpus tier.

Product quantization's ADC lookup (the reference-era compression idiom,
and qdrant's) maps poorly onto TPU hardware: the VPU exposes no per-lane
table gather, so ADC degenerates into one-hot matmuls that cost more than
the exact scan they replace. The compression that *composes* with the MXU
is plain low-bit quantization: per-row-scaled int8 rows scanned as an
integer matmul (int8 x int8 -> int32 runs at 2x bf16 MXU rate) with the
scale correction fused in before selection.

- storage: 1 byte/dim + one f32 scale/row = 260 B/row at D=256 — 2x less
  HBM traffic than bf16, 4x less than f32;
- accuracy: unit-norm 256-d rows quantize with ~1e-3 relative sim error,
  the same order as bf16 inputs; ranking quality is unaffected for
  retrieval (validated in tests against the f32 scan);
- selection: same two-phase exact-top-k structure as
  :mod:`semtools_tpu.ops.pallas_scan` (tile-max sweep, then rescan of the
  <= Q*k candidate tiles), with ties broken toward the lower corpus index.

"Exact" here means exact over the *quantized* similarities; callers who
need f32-exact ordering re-rank the returned candidates against original
rows (the store's ANN tier does the same).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 8192 rows x 256 dims x 1 B = 2 MB per buffered tile: large enough to
# amortize per-grid-step overhead, small enough for double buffering plus
# the [Q, tile] f32 similarity tile in 16 MB VMEM.
TILE_N = 8192

_NEG_INF = float("-inf")


def quantize_rows(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization: x ~= q * scale[:, None].

    Zero rows get scale 0 (their dot with anything is 0, distance 1.0 —
    matching the zero-vector semantics of the f32 scan).
    """
    x = np.asarray(x, np.float32)
    amax = np.max(np.abs(x), axis=1)
    scale = amax / 127.0
    inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1.0), 0.0)
    q = np.clip(np.rint(x * inv[:, None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def _scaled_sims(q_ref, e_ref, qs_ref, es_ref):
    """[Q, TILE_N] f32 similarities from int8 blocks + per-row scales."""
    acc = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return acc * qs_ref[:] * es_ref[:].T  # [Q,1] * [Q,TILE_N] * [1,TILE_N]


def _tilemax_kernel(q_ref, e_ref, qs_ref, es_ref, out_ref, *, n_true: int):
    i = pl.program_id(0)
    qn = q_ref.shape[0]
    sims = _scaled_sims(q_ref, e_ref, qs_ref, es_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, TILE_N), 1)
    sims = jnp.where(col + i * TILE_N < n_true, sims, _NEG_INF)
    out_ref[0] = jnp.broadcast_to(jnp.max(sims, axis=1)[None, :], (8, qn))


def _rescan_kernel(ids_ref, q_ref, e_ref, qs_ref, es_ref, vals_ref, idx_ref,
                   *, k: int, k_tiles: int, n_true: int):
    i = pl.program_id(0)
    tile_id = ids_ref[i]
    owner = i // k_tiles
    qn = q_ref.shape[0]

    sims = _scaled_sims(q_ref, e_ref, qs_ref, es_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, TILE_N), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (qn, TILE_N), 0)
    valid = (col + tile_id * TILE_N < n_true) & (row == owner)
    sims = jnp.where(valid, sims, _NEG_INF)

    vals = []
    idxs = []
    for _ in range(k):
        m = jnp.max(sims, axis=1, keepdims=True)
        arg = jnp.min(jnp.where(sims == m, col, TILE_N), axis=1, keepdims=True)
        vals.append(m)
        idxs.append(arg)
        sims = jnp.where(col == arg, _NEG_INF, sims)

    vals_ref[0] = jnp.concatenate(vals, axis=1)
    idx_ref[0] = jnp.concatenate(idxs, axis=1) + tile_id * TILE_N


@functools.partial(jax.jit, static_argnames=("k", "n_true", "interpret"))
def _int8_two_phase(q8, e8, q_scale, e_scale, *, k: int, n_true: int, interpret: bool):
    qn, d = q8.shape
    n_pad = e8.shape[0]
    num_tiles = n_pad // TILE_N
    qs = q_scale.reshape(qn, 1)
    es = e_scale.reshape(n_pad, 1)

    tile_max = pl.pallas_call(
        functools.partial(_tilemax_kernel, n_true=n_true),
        grid_spec=pl.GridSpec(
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((qn, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, qn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, qn), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n_pad * d,
            bytes_accessed=n_pad * (d + 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q8, e8, qs, es)[:, 0, :]

    k_tiles = min(k, num_tiles)
    _, tile_ids = jax.lax.top_k(tile_max.T, k_tiles)
    flat_ids = tile_ids.reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qn * k_tiles,),
        in_specs=[
            pl.BlockSpec((qn, d), lambda i, ids: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d), lambda i, ids: (ids[i], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, 1), lambda i, ids: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i, ids: (ids[i], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, qn, k), lambda i, ids: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qn, k), lambda i, ids: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    cand_vals, cand_idx = pl.pallas_call(
        functools.partial(_rescan_kernel, k=k, k_tiles=k_tiles, n_true=n_true),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qn * k_tiles, qn, k), jnp.float32),
            jax.ShapeDtypeStruct((qn * k_tiles, qn, k), jnp.int32),
        ],
        interpret=interpret,
    )(flat_ids, q8, e8, qs, es)

    t, _, kk = cand_vals.shape
    flat_vals = jnp.transpose(cand_vals, (1, 0, 2)).reshape(qn, t * kk)
    flat_idx = jnp.transpose(cand_idx, (1, 0, 2)).reshape(qn, t * kk)
    sv, si = jax.lax.sort((-flat_vals, flat_idx), dimension=1, num_keys=2)
    return 1.0 + sv[:, :k], si[:, :k]


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def int8_topk_scan(
    q: np.ndarray,
    e8: np.ndarray,
    e_scale: np.ndarray,
    k: int,
    *,
    interpret: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k over an int8-quantized corpus. ``q`` is f32 (quantized here).

    Returns (distances [Q, k'], indices [Q, k']) ascending, k' = min(k, N);
    distances are 1 - quantized-sim (~1e-3 from the f32 values).
    """
    if interpret is None:
        interpret = _should_interpret()
    q8, q_scale = quantize_rows(np.asarray(q))
    n = e8.shape[0]
    k_eff = min(k, n)
    if k_eff == 0:
        qn = q8.shape[0]
        return np.zeros((qn, 0), np.float32), np.zeros((qn, 0), np.int64)

    n_pad = -(-n // TILE_N) * TILE_N
    if n_pad != n:
        e8 = np.concatenate([e8, np.zeros((n_pad - n, e8.shape[1]), np.int8)], axis=0)
        e_scale = np.concatenate([e_scale, np.zeros(n_pad - n, np.float32)])
    d, i = _int8_two_phase(
        jnp.asarray(q8), jnp.asarray(e8), jnp.asarray(q_scale), jnp.asarray(e_scale),
        k=k_eff, n_true=n, interpret=interpret,
    )
    return np.asarray(d), np.asarray(i)
