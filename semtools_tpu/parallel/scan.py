"""Mesh-sharded similarity scan: per-device partial top-k + all-gather merge.

Mathematically the same merge the reference's store performs over its
1000-path query chunks (store.rs:495-543: per-chunk candidates, global
re-sort, truncate) — per-shard top-k followed by a global top-k over the
gathered candidates preserves the exact global top-k for brute-force
scoring, because no shard can contribute more than k winners.

TPU mapping: each device scans its local [N/d, D] shard on the MXU; the
[Q, k] candidate tiles (values + global indices) ride ICI via
``all_gather``; the final ``lax.top_k`` over [Q, d*k] is negligible. Per
step this moves O(Q·k·d) bytes over ICI versus O(Q·N) for gathering raw
distances — the collective cost is independent of corpus size.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semtools_tpu.parallel.mesh import SHARD_AXIS, corpus_mesh, shard_corpus

_PRECISION = jax.lax.Precision.HIGHEST


def _local_then_global_topk(
    q, e_local, n_true, *, k: int, n_local: int, n_shards: int, axis: str,
    fused: bool = False, interpret: bool = False
):
    """Runs per device under shard_map; returns replicated global top-k.

    ``n_true`` is a TRACED scalar: corpus mutations that keep the padded
    shape (row counts are bucketed by the callers) reuse the compiled
    executable instead of retracing — the steady-state requirement for
    daemon-resident multi-device serving. Kernels run over all local rows
    (pads are zero vectors) and pad winners are demoted after, before the
    merge.
    """
    k_local = min(k, n_local)
    if fused:
        # Per-device fused Pallas scan (tile-max sweep + candidate rescan)
        # instead of materializing [Q, n_local] sims + lax.top_k — the
        # same ~20x that the single-chip path gains. Each device masks its
        # OWN pad rows inside the kernel with the dynamic local true
        # count: pad rows must never crowd real (possibly negative-sim)
        # rows out of the local candidate set before the merge.
        from semtools_tpu.ops.pallas_scan import TILE_N, _two_phase_topk, pad_rows

        local_true = jnp.clip(
            n_true - jax.lax.axis_index(axis) * n_local, 0, n_local
        ).astype(jnp.int32)
        # Pad the local shard to a tile multiple: _two_phase_topk's grid
        # floors at tile boundaries, so an unpadded ragged tail would be
        # silently skipped.
        d_loc, idx_l = _two_phase_topk(
            q, pad_rows(e_local, TILE_N), local_true, k=k_local,
            interpret=interpret
        )
        vals = 1.0 - d_loc  # sims desc
        idx = idx_l + jax.lax.axis_index(axis) * n_local
        pad = idx >= n_true  # belt-and-suspenders; kernel already masked
        vals = jnp.where(pad, -jnp.inf, vals)
        idx = jnp.where(pad, n_local * n_shards, idx)
    else:
        sims = jnp.dot(q, e_local.T, preferred_element_type=jnp.float32, precision=_PRECISION)
        # Padding rows (global index >= n_true) must never win the merge: a
        # pad row's sim of 0.0 would outrank genuinely negative similarities.
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_local), 1)
        global_col = col + jax.lax.axis_index(axis) * n_local
        sims = jnp.where(global_col < n_true, sims, -jnp.inf)
        vals, idx = jax.lax.top_k(sims, k_local)  # local winners [Q, k_local]
        idx = idx + jax.lax.axis_index(axis) * n_local  # globalize indices

    # Candidate tiles from every shard, concatenated in shard order so
    # lax.top_k's prefer-earlier tie-break keeps corpus order.
    vals_all = jax.lax.all_gather(vals, axis, axis=1, tiled=True)  # [Q, d*k_local]
    idx_all = jax.lax.all_gather(idx, axis, axis=1, tiled=True)

    best_vals, pos = jax.lax.top_k(vals_all, min(k, n_shards * k_local))
    best_idx = jnp.take_along_axis(idx_all, pos, axis=1)
    return 1.0 - best_vals, best_idx


def _local_then_global_topk_masked(
    q, e_local, n_true, mask_local, *, k: int, n_local: int, n_shards: int,
    axis: str
):
    """Masked sibling of :func:`_local_then_global_topk` (non-fused XLA
    path only — the fused kernels have no mask operand): rows whose
    ``mask_local`` entry is False are demoted to -inf similarity before
    the local top-k, so the all-gather merge only ever sees subset rows.
    Funds path-subset queries against the warm mesh-sharded slot corpus;
    the mask is row-sharded with the same spec as the corpus."""
    k_local = min(k, n_local)
    sims = jnp.dot(q, e_local.T, preferred_element_type=jnp.float32,
                   precision=_PRECISION)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_local), 1)
    global_col = col + jax.lax.axis_index(axis) * n_local
    keep = (global_col < n_true) & (mask_local[None, :] != 0)
    sims = jnp.where(keep, sims, -jnp.inf)
    vals, idx = jax.lax.top_k(sims, k_local)
    idx = idx + jax.lax.axis_index(axis) * n_local
    # Demote masked/-inf winners' indices to the pad sentinel so the
    # caller's `idx < n_true` filter drops them uniformly.
    idx = jnp.where(jnp.isfinite(vals), idx, n_local * n_shards)

    vals_all = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
    idx_all = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
    best_vals, pos = jax.lax.top_k(vals_all, min(k, n_shards * k_local))
    best_idx = jnp.take_along_axis(idx_all, pos, axis=1)
    return 1.0 - best_vals, best_idx


@functools.lru_cache(maxsize=128)
def _topk_fn_cached_masked(mesh: Mesh, k: int, n_local: int, axis: str):
    fn = jax.shard_map(
        functools.partial(
            _local_then_global_topk_masked,
            k=k,
            n_local=n_local,
            n_shards=int(mesh.devices.size),
            axis=axis,
        ),
        mesh=mesh,
        in_specs=(P(None, None), P(axis, None), P(), P(axis)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn)


def _use_fused_local(n_local: int, n_shards: int, k: int) -> bool:
    """Fused per-device scan: TPU backend, CLI-scale k (pad rows are
    handled by the traced n_true mask after the kernel)."""
    import os

    del n_shards
    if os.environ.get("SEMTOOLS_TPU_NO_PALLAS"):
        return False
    if k > 64:
        return False
    from semtools_tpu.ops.pallas_scan import TILE_N

    if n_local < 2 * TILE_N:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def sharded_topk_fn(
    mesh: Mesh, k: int, n_local: int, axis: str = SHARD_AXIS,
    fused: Optional[bool] = None, interpret: bool = False
):
    """Build the jitted sharded scan for a given mesh/k/shard size.

    Cached per (mesh, shapes) — NOT per n_true, which is a traced operand
    of the returned function (call as ``fn(q, e_sharded, n_true)``), so
    mutations that keep the bucketed padded shape reuse the executable.
    """
    if fused is None:
        fused = _use_fused_local(n_local, int(mesh.devices.size), k)
    return _topk_fn_cached(mesh, k, n_local, axis, fused, interpret)


@functools.lru_cache(maxsize=128)
def _topk_fn_cached(
    mesh: Mesh, k: int, n_local: int, axis: str, fused: bool,
    interpret: bool
):
    fn = jax.shard_map(
        functools.partial(
            _local_then_global_topk,
            k=k,
            n_local=n_local,
            n_shards=int(mesh.devices.size),
            axis=axis,
            fused=fused,
            interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(P(None, None), P(axis, None), P()),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_topk_scan(
    q: np.ndarray,
    corpus: np.ndarray,
    k: int,
    mesh: Optional[Mesh] = None,
    axis: str = SHARD_AXIS,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k of ``q`` against ``corpus`` sharded across ``mesh``.

    Returns (distances [Q, k'], global indices [Q, k']), k' = min(k, N),
    ascending by distance. Results match the single-device
    ``semtools_tpu.ops.scan.topk_scan`` exactly (up to cross-shard ties).
    """
    if mesh is None:
        mesh = corpus_mesh()
    if not isinstance(corpus, jax.Array):
        corpus = corpus.astype(np.float32, copy=False)
    e_sharded, n = shard_corpus(corpus, mesh, axis)
    return sharded_topk_scan_device(q, e_sharded, n, k, mesh, axis)


def sharded_topk_scan_device(
    q: np.ndarray,
    e_sharded,
    n_true: int,
    k: int,
    mesh: Mesh,
    axis: str = SHARD_AXIS,
    mask=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Like :func:`sharded_topk_scan` but over an already mesh-sharded
    device array (e.g. the store's device cache); rows at global index
    >= ``n_true`` are zero padding and never selected. ``mask`` is an
    optional row-sharded [padded_N] bool device array; rows where it is
    False are never selected (path-subset serving)."""
    k_eff = min(k, n_true)
    if k_eff == 0:
        return (
            np.zeros((q.shape[0], 0), np.float32),
            np.zeros((q.shape[0], 0), np.int64),
        )
    n_local = e_sharded.shape[0] // mesh.devices.size
    if mask is not None:
        fn = _topk_fn_cached_masked(mesh, k_eff, n_local, axis)
        d, i = fn(jnp.asarray(q, jnp.float32), e_sharded, jnp.int32(n_true), mask)
    else:
        fn = sharded_topk_fn(mesh, k_eff, n_local, axis)
        d, i = fn(jnp.asarray(q, jnp.float32), e_sharded, jnp.int32(n_true))
    d = np.asarray(d)
    i = np.asarray(i)

    # Padding rows (index >= n_true) can only surface when k > true local
    # rows; mask them out.
    valid = i < n_true
    if not valid.all():
        out_d = []
        out_i = []
        for row in range(d.shape[0]):
            keep = valid[row]
            out_d.append(d[row][keep][:k_eff])
            out_i.append(i[row][keep][:k_eff])
        width = min(min(len(r) for r in out_i), k_eff)
        d = np.stack([r[:width] for r in out_d])
        i = np.stack([r[:width] for r in out_i])
    return d, i


# -- int8 sharded scan -------------------------------------------------------


def _local_int8_topk(q8, e8_local, n_true, *, k: int, n_local: int,
                     n_shards: int, axis: str, interpret: bool):
    """Per-device fused int8 scan under shard_map + all-gather merge.

    Shard row counts are equal (caller pads the corpus to a multiple of
    the mesh size with zero rows); integer similarities are comparable
    across shards because the quantization scale is global
    (semtools_tpu.ops.int8_scan), so the candidate merge is exact over the
    quantized values. Global pad rows (index >= ``n_true``) are demoted
    below any real similarity before the merge.
    """
    from semtools_tpu.ops.int8_scan import TILE_N, _int8_two_phase
    from semtools_tpu.ops.pallas_scan import pad_rows

    k_local = min(k, n_local)
    local_true = jnp.clip(
        n_true - jax.lax.axis_index(axis) * n_local, 0, n_local
    ).astype(jnp.int32)
    sims_desc, idx_l = _int8_two_phase(
        q8, pad_rows(e8_local, TILE_N), local_true, k=k_local,
        interpret=interpret
    )
    idx = idx_l + jax.lax.axis_index(axis) * n_local
    pad = idx >= n_true  # belt-and-suspenders; kernel already masked
    sims_desc = jnp.where(pad, jnp.int32(-(1 << 30)), sims_desc)
    idx = jnp.where(pad, n_local * n_shards, idx)
    vals_all = jax.lax.all_gather(sims_desc, axis, axis=1, tiled=True)
    idx_all = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
    # ties -> lower corpus index: sort by (sim desc, index asc)
    sv, si = jax.lax.sort((-vals_all, idx_all), dimension=1, num_keys=2)
    kk = min(k, n_shards * k_local)
    return -sv[:, :kk], si[:, :kk]


@functools.lru_cache(maxsize=128)
def _int8_fn_cached(
    mesh: Mesh, k: int, n_local: int, axis: str, interpret: bool
):
    fn = jax.shard_map(
        functools.partial(
            _local_int8_topk,
            k=k,
            n_local=n_local,
            n_shards=int(mesh.devices.size),
            axis=axis,
            interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(P(None, None), P(axis, None), P()),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_int8_topk_scan(
    q: np.ndarray,
    e8: np.ndarray,
    e_scale: float,
    k: int,
    mesh: Optional[Mesh] = None,
    axis: str = SHARD_AXIS,
    interpret: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact-over-quantized top-k of ``q`` against a global-scale int8
    corpus sharded across ``mesh`` (BASELINE config 5 at 10M-chunk scale:
    int8 keeps a 10M x 256 shard at 320 MB/device on an 8-device mesh).

    Returns (distances [Q, k'], global indices [Q, k']) ascending;
    distance = 1 - int_sim * scale_q * scale_e.
    """
    if mesh is None:
        mesh = corpus_mesh()
    n = e8.shape[0]
    n_dev = int(mesh.devices.size)
    e8 = np.ascontiguousarray(e8)
    pad = (-n) % n_dev
    if pad:
        e8 = np.concatenate([e8, np.zeros((pad, e8.shape[1]), e8.dtype)], axis=0)
    sharding = NamedSharding(mesh, P(axis, None))
    e_dev = jax.device_put(e8, sharding)
    return sharded_int8_topk_scan_device(
        q, e_dev, e_scale, k, n, mesh, axis, interpret=interpret
    )


def sharded_int8_topk_scan_device(
    q: np.ndarray,
    e8_sharded,
    e_scale: float,
    k: int,
    n_true: int,
    mesh: Mesh,
    axis: str = SHARD_AXIS,
    interpret: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Like :func:`sharded_int8_topk_scan` but over an already mesh-sharded
    int8 device array; rows at global index >= ``n_true`` are zero padding
    and never selected."""
    from semtools_tpu.ops.int8_scan import _should_interpret, quantize_global

    if interpret is None:
        interpret = _should_interpret()
    k_eff = min(k, n_true)
    if k_eff == 0:
        return (
            np.zeros((q.shape[0], 0), np.float32),
            np.zeros((q.shape[0], 0), np.int64),
        )
    n_dev = int(mesh.devices.size)
    n_local = e8_sharded.shape[0] // n_dev
    q8, q_scale = quantize_global(np.asarray(q))

    fn = _int8_fn_cached(mesh, k_eff, n_local, axis, interpret)
    sims, idx = fn(jnp.asarray(q8), e8_sharded, jnp.int32(n_true))
    sims = np.asarray(sims)[:, :k_eff]
    idx = np.asarray(idx)[:, :k_eff]
    dists = 1.0 - sims * (q_scale * e_scale)

    # Pad sentinels (index == padded N) surface only when k exceeds the
    # real row count on some shard; drop them, keeping rows rectangular.
    valid = idx < n_true
    if not valid.all():
        out_d, out_i = [], []
        for row in range(dists.shape[0]):
            keep = valid[row]
            out_d.append(dists[row][keep][:k_eff])
            out_i.append(idx[row][keep][:k_eff])
        width = min(min(len(r) for r in out_i), k_eff)
        dists = np.stack([r[:width] for r in out_d])
        idx = np.stack([r[:width] for r in out_i])
    return dists, idx.astype(np.int64)


# -- int4 sharded deep-candidate extraction -----------------------------------
#
# The store's int4 tier serves through a margin-threshold candidate
# extraction (ops.int4_scan.int4_deep_candidates) rather than a fixed-k
# top-k: the quantization noise demands density-scaled candidate depth.
# Distributed, that becomes the same two-phase shape as the sharded
# threshold scan: phase 1 computes per-device biased sims (kept sharded
# on device), derives the EXACT global k_cut-th-best biased sim via an
# all-gather of per-device top-k_cut values, widens it by the noise
# margin, and counts per-device rows above; one scalar to host sizes the
# phase-2 compaction buffers. Phase 2 extracts each device's rows above
# the cutoff and all-gathers the global ids. The cutoff is globally
# exact, so the sharded candidate SET equals the single-device one.


def _local_int4_cutoff(q8, p4_local, n_true, margin, *extra, k_cut: int,
                       n_local: int, n_shards: int, tile_n: int, axis: str,
                       interpret: bool, masked: bool):
    from semtools_tpu.ops.int4_scan import _int4_all_sims
    from semtools_tpu.ops.pallas_scan import SUB_N, pad_rows

    qn = q8.shape[0]
    local_true = jnp.clip(
        n_true - jax.lax.axis_index(axis) * n_local, 0, n_local
    ).astype(jnp.int32)
    p4p = pad_rows(p4_local, tile_n)
    sub_n = min(SUB_N, tile_n)
    mask2d = None
    if masked:
        m = extra[0]
        pad = p4p.shape[0] - m.shape[0]
        if pad:
            m = jnp.concatenate([m, jnp.zeros(pad, m.dtype)])
        mask2d = m.reshape(p4p.shape[0] // sub_n, sub_n)
    sims, flat_max = _int4_all_sims(
        q8, p4p, local_true.reshape(1), mask2d, tile_n=tile_n,
        interpret=interpret,
    )
    # Exact per-device k_cut-th best via candidate blocks (a block's rank
    # is its best element's rank, so k_cut blocks hold the top k_cut rows).
    n_pad_l = sims.shape[1]
    nb = n_pad_l // sub_n
    blocks = sims.reshape(qn, nb, sub_n)
    kb = min(k_cut, nb)
    _, bids = jax.lax.top_k(flat_max, kb)
    cand = jnp.take_along_axis(blocks, bids[:, :, None], axis=1)
    loc_top, _ = jax.lax.top_k(cand.reshape(qn, kb * sub_n),
                               min(k_cut, kb * sub_n))
    if loc_top.shape[1] < k_cut:  # tiny shard: fewer rows than k_cut
        fill = jnp.full((qn, k_cut - loc_top.shape[1]), -jnp.inf, jnp.float32)
        loc_top = jnp.concatenate([loc_top, fill], axis=1)
    all_top = jax.lax.all_gather(loc_top, axis, axis=1, tiled=True)
    g_top, _ = jax.lax.top_k(all_top, k_cut)
    t = g_top[:, -1]
    # -inf k_cut-th best (fewer selectable rows than k_cut globally):
    # keep every finite sim instead of sweeping in -inf pads.
    cutoff = jnp.where(jnp.isfinite(t), t - margin, jnp.float32(-3e38))
    # Per-QUERY mesh-max count and candidate-block count (not a global
    # scalar): zero-padded query rows score sim 0 against every row, so
    # folding them into one max would size the extraction cap at ~n.
    # The host slices [:qn].
    count_local = jnp.sum(sims >= cutoff[:, None], axis=1, dtype=jnp.int32)
    count_q = jax.lax.pmax(count_local, axis)
    nb_local = jnp.sum(flat_max >= cutoff[:, None], axis=1, dtype=jnp.int32)
    nb_q = jax.lax.pmax(nb_local, axis)
    return sims, flat_max, cutoff, count_q, nb_q


def _local_int4_extract(sims_local, flat_max_local, cutoff, *, n_b: int,
                        cap: int, sub_n: int, n_local: int, n_shards: int,
                        axis: str):
    """Each device's rows at or above the cutoff (<= cap of them; the cap
    bounds the mesh-max count, so nothing is dropped), all-gathered as
    global ids with sentinel = padded global row count. Same two-level
    extraction as ops.int4_scan._extract_above (candidate blocks from
    the per-device maxima, value selection only inside them)."""
    from semtools_tpu.ops.int4_scan import _extract_above

    qn, n_pad_l = sims_local.shape
    sentinel = jnp.int32(n_local * n_shards)
    ids = _extract_above(sims_local, flat_max_local, cutoff, n_b=n_b,
                         cap=cap, sub_n=sub_n)
    gids = jnp.where(
        ids < n_local, ids + jax.lax.axis_index(axis) * n_local, sentinel
    )
    return jax.lax.all_gather(gids, axis, axis=1, tiled=True)


_int4_fn_cache: dict = {}


def _int4_deep_fns(mesh: Mesh, axis: str, n_local: int, tile_n: int,
                   k_cut: int, n_b: int, cap: int, masked: bool,
                   interpret: bool):
    """Jitted shard_map wrappers for the two int4 phases, cached per
    (mesh, shapes); n_true/margin stay traced and Q is keyed by jit."""
    key = ("int4", tuple(mesh.devices.flat), axis, n_local, tile_n, k_cut,
           n_b, cap, masked, interpret)
    if key in _int4_fn_cache:
        return _int4_fn_cache[key]
    n_shards = int(mesh.devices.size)
    in_specs = [P(None, None), P(axis, None), P(), P()]
    if masked:
        in_specs.append(P(axis))
    cutoff_fn = jax.jit(jax.shard_map(
        functools.partial(
            _local_int4_cutoff, k_cut=k_cut, n_local=n_local,
            n_shards=n_shards, tile_n=tile_n, axis=axis,
            interpret=interpret, masked=masked,
        ),
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, axis), P(None, axis), P(None), P(None), P(None)),
        check_vma=False,
    ))
    extract_fn = None
    if cap:
        sub_n = min(512, tile_n)
        extract_fn = jax.jit(jax.shard_map(
            functools.partial(_local_int4_extract, n_b=n_b, cap=cap,
                              sub_n=sub_n, n_local=n_local,
                              n_shards=n_shards, axis=axis),
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis), P(None)),
            out_specs=P(None, None),
            check_vma=False,
        ))
    _int4_fn_cache[key] = (cutoff_fn, extract_fn)
    return cutoff_fn, extract_fn


def sharded_int4_deep_candidates_device(
    q: np.ndarray,
    p4_sharded,
    n_true: int,
    mesh: Mesh,
    axis: str = SHARD_AXIS,
    mask=None,
    k_cut: int = 10,
    margin_sigmas: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> np.ndarray:
    """Mesh-sharded :func:`semtools_tpu.ops.int4_scan.int4_deep_candidates`
    over an already row-sharded packed corpus: [Q, M] int32 global row
    ids (entries >= ``n_true`` are sentinels the caller drops; order is
    shard-major, not sorted). The cutoff is the exact global
    ``k_cut``-th-best biased sim minus the noise margin — identical to
    the single-device computation, so the candidate set matches it.

    ``mask`` is an optional row-sharded [padded_N] int8 device array
    (path-subset serving); masked rows never surface.
    """
    from semtools_tpu.ops.int4_scan import (
        _should_interpret,
        int4_candidate_cap,
        int4_margin_sigmas,
        tile_for_rows,
    )
    from semtools_tpu.ops.int8_scan import quantize_global

    if interpret is None:
        interpret = _should_interpret()
    if margin_sigmas is None:
        margin_sigmas = int4_margin_sigmas()
    q = np.asarray(q)
    q8, _ = quantize_global(q)
    qn = q8.shape[0]
    if n_true == 0 or qn == 0:
        return np.zeros((qn, 0), np.int32)
    qpad = (-qn) % 8  # Mosaic: sims block second-minor dim % 8 == 0
    if qpad:
        q8 = np.concatenate([q8, np.zeros((qpad, q8.shape[1]), np.int8)])
    n_dev = int(mesh.devices.size)
    n_local = p4_sharded.shape[0] // n_dev
    tile_n = tile_for_rows(n_local, q8.shape[0])
    while n_local % tile_n and tile_n > 512:
        tile_n //= 2  # zero-copy: the tile must divide the local shard

    sigma = float(
        np.max(np.linalg.norm(q8[:qn].astype(np.float64), axis=1))
    ) / np.sqrt(12.0)
    margin = jnp.float32(margin_sigmas * sigma)
    nt = jnp.int32(n_true)

    cutoff_fn, _ = _int4_deep_fns(
        mesh, axis, n_local, tile_n, k_cut, n_b=0, cap=0,
        masked=mask is not None, interpret=interpret,
    )
    args = (jnp.asarray(q8), p4_sharded, nt, margin)
    if mask is not None:
        args = args + (mask,)
    sims_sharded, flat_max_sharded, cutoff, count_q, nb_q = cutoff_fn(*args)
    count = int(np.max(np.asarray(count_q[:qn])))
    if count == 0:
        return np.zeros((qn, 0), np.int32)
    max_nb = int(np.max(np.asarray(nb_q[:qn])))
    sub_n = min(512, tile_n)
    nb_local = int(sims_sharded.shape[1]) // n_dev // sub_n
    cap = min(
        1 << max(int(count - 1).bit_length(), 4),
        int4_candidate_cap(n_true),
        n_local,
    )
    n_b = min(1 << max(int(max_nb - 1).bit_length(), 2), nb_local)
    _, extract_fn = _int4_deep_fns(
        mesh, axis, n_local, tile_n, k_cut, n_b=n_b, cap=cap,
        masked=mask is not None, interpret=interpret,
    )
    ids = extract_fn(sims_sharded, flat_max_sharded, cutoff)
    return np.asarray(ids[:qn])


# -- sharded threshold scan ---------------------------------------------------
#
# Threshold mode returns ALL hits under a distance bound (reference
# src/search/mod.rs:113-119), so the fixed-k candidate merge does not
# apply (SURVEY.md §7 "hard parts"). Distributed collection runs in two
# phases with static shapes throughout; both phases read the SAME
# per-device distance vector (computed once, kept sharded on device —
# separately compiled matmuls could disagree by an ulp at the boundary):
#
#   1. per-device distances + hit count, MAX-reduced over the mesh (the
#      cap must bound the largest per-device hit count, not the total) —
#      one scalar to host picks the pow2 buffer size;
#   2. per-device compaction into a [cap] buffer, all-gathered and merged
#      on host.


_threshold_fn_cache: dict = {}  # jitted shard_map wrappers, keyed by
# (tag, mesh devices, axis, n_local, cap) — threshold/n_true stay traced


def _local_batched_threshold_dists(q, e_local, t, n_true, *, n_local: int,
                                   axis: str):
    """[Q, n_local] local distance block + the mesh-max per-(query, device)
    hit count (the compaction cap must bound the largest per-device row)."""
    sims = jnp.dot(q, e_local.T, preferred_element_type=jnp.float32,
                   precision=_PRECISION)
    d = 1.0 - sims
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_local), 1)
    gcol = col + jax.lax.axis_index(axis) * n_local
    d = jnp.where(gcol < n_true, d, jnp.inf)
    local = jnp.max(jnp.sum(d < t, axis=1))
    return d, jnp.max(jax.lax.all_gather(local, axis))


def _local_batched_threshold_dists_masked(q, e_local, t, n_true, mask_local,
                                          *, n_local: int, axis: str):
    """Masked sibling of :func:`_local_batched_threshold_dists`: rows
    whose ``mask_local`` entry is False read as +inf distance, so they
    neither count as hits nor survive phase 2 (which re-reads this same
    distance block)."""
    sims = jnp.dot(q, e_local.T, preferred_element_type=jnp.float32,
                   precision=_PRECISION)
    d = 1.0 - sims
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_local), 1)
    gcol = col + jax.lax.axis_index(axis) * n_local
    keep = (gcol < n_true) & (mask_local[None, :] != 0)
    d = jnp.where(keep, d, jnp.inf)
    local = jnp.max(jnp.sum(d < t, axis=1))
    return d, jnp.max(jax.lax.all_gather(local, axis))


def _local_batched_threshold_extract(d, t, n_true, *, n_local: int, cap: int,
                                     axis: str):
    """Each device's ``cap`` nearest rows per query (ascending, ties to the
    lower local index), all-gathered in shard order. Reads the SAME sharded
    distance block phase 1 produced. Non-hits surface as d >= t (or inf)
    and are filtered on host against the same values."""
    del t
    neg, li = jax.lax.top_k(-d, cap)  # [Q, cap] per device
    vals = -neg
    gidx = li + jax.lax.axis_index(axis) * n_local
    gidx = jnp.where(jnp.isfinite(vals), gidx, n_true)  # pad sentinel
    vals_all = jax.lax.all_gather(vals, axis, axis=1, tiled=True)  # [Q, d*cap]
    idx_all = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
    return vals_all, idx_all


def _batched_threshold_fns(
    mesh: Mesh, axis: str, n_local: int, cap: int, masked: bool = False
):
    """Jitted shard_map wrappers for the batched threshold phases, cached per
    (mesh, shapes); threshold/n_true stay traced and Q is keyed by jit.
    ``masked`` selects the phase-1 variant taking a row-sharded keep mask
    (phase 2 is mask-agnostic: it re-reads the masked distance block)."""
    key = ("batched", tuple(mesh.devices.flat), axis, n_local, cap, masked)
    if key in _threshold_fn_cache:
        return _threshold_fn_cache[key]
    if masked:
        dist_fn = jax.jit(jax.shard_map(
            functools.partial(_local_batched_threshold_dists_masked,
                              n_local=n_local, axis=axis),
            mesh=mesh,
            in_specs=(P(None, None), P(axis, None), P(), P(), P(axis)),
            out_specs=(P(None, axis), P()),
            check_vma=False,
        ))
    else:
        dist_fn = jax.jit(jax.shard_map(
            functools.partial(_local_batched_threshold_dists, n_local=n_local,
                              axis=axis),
            mesh=mesh, in_specs=(P(None, None), P(axis, None), P(), P()),
            out_specs=(P(None, axis), P()),
            check_vma=False,
        ))
    extract_fn = None
    if cap:
        extract_fn = jax.jit(jax.shard_map(
            functools.partial(_local_batched_threshold_extract,
                              n_local=n_local, cap=cap, axis=axis),
            mesh=mesh, in_specs=(P(None, axis), P(), P()),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        ))
    _threshold_fn_cache[key] = (dist_fn, extract_fn)
    return dist_fn, extract_fn


def sharded_batched_threshold_scan_device(
    q: np.ndarray,
    e_sharded,
    n_true: int,
    max_distance: float,
    mesh: Mesh,
    axis: str = SHARD_AXIS,
    mask=None,
):
    """Threshold mode for a BATCH of queries over a mesh-sharded corpus in
    O(1) device dispatches (two phases: sharded distances + hit-count max,
    then per-device top-``cap`` compaction all-gathered over ICI).

    Per-query contract matches :func:`sharded_threshold_scan_device` /
    ``ops.scan.batched_threshold_scan``: returns a list of
    (distances [M_i], global indices [M_i]) pairs, ascending by distance,
    ties toward the lower corpus index; rows >= ``n_true`` never match.
    ``mask`` is an optional row-sharded [padded_N] bool device array;
    rows where it is False never match (path-subset serving).
    """
    qn = int(q.shape[0])
    empty = (np.zeros(0, np.float32), np.zeros(0, np.int64))
    if n_true == 0 or qn == 0:
        return [empty] * qn
    n_dev = int(mesh.devices.size)
    n_local = e_sharded.shape[0] // n_dev
    qd = jnp.asarray(q, jnp.float32)
    t = jnp.float32(max_distance)
    nt = jnp.int32(n_true)

    dist_fn, _ = _batched_threshold_fns(
        mesh, axis, n_local, cap=0, masked=mask is not None
    )
    if mask is not None:
        d_sharded, max_local = dist_fn(qd, e_sharded, t, nt, mask)
    else:
        d_sharded, max_local = dist_fn(qd, e_sharded, t, nt)
    max_local = int(max_local)
    if max_local == 0:
        return [empty] * qn
    cap = min(1 << (max_local - 1).bit_length(), n_local)

    _, extract_fn = _batched_threshold_fns(mesh, axis, n_local, cap=cap)
    vals, idx = extract_fn(d_sharded, t, nt)
    vals = np.asarray(vals)
    idx = np.asarray(idx)
    out = []
    for row in range(qn):
        keep = vals[row] < max_distance
        v, i = vals[row][keep], idx[row][keep]
        order = np.lexsort((i, v))  # distance asc, index asc on ties
        out.append((v[order], i[order].astype(np.int64)))
    return out


def sharded_batched_threshold_scan(
    q: np.ndarray,
    corpus: np.ndarray,
    max_distance: float,
    mesh: Optional[Mesh] = None,
    axis: str = SHARD_AXIS,
):
    """Host-corpus wrapper for :func:`sharded_batched_threshold_scan_device`."""
    if mesh is None:
        mesh = corpus_mesh()
    n = corpus.shape[0]
    if n == 0:
        return [(np.zeros(0, np.float32), np.zeros(0, np.int64))] * int(q.shape[0])
    if not isinstance(corpus, jax.Array):
        corpus = corpus.astype(np.float32, copy=False)
    e_sharded, _ = shard_corpus(corpus, mesh, axis)
    return sharded_batched_threshold_scan_device(
        q, e_sharded, n, max_distance, mesh, axis
    )


def sharded_threshold_scan(
    q: np.ndarray,
    corpus: np.ndarray,
    max_distance: float,
    mesh: Optional[Mesh] = None,
    axis: str = SHARD_AXIS,
) -> Tuple[np.ndarray, np.ndarray]:
    """All hits with distance < max_distance over a mesh-sharded corpus.

    Same contract as :func:`semtools_tpu.ops.scan.threshold_scan`
    (Q == 1; distances ascending, ties by index). Collective cost is
    O(devices * max_per_device_hits), independent of corpus size when the
    threshold is selective.
    """
    assert q.shape[0] == 1, "sharded_threshold_scan expects a single query row"
    if mesh is None:
        mesh = corpus_mesh()
    n = corpus.shape[0]
    if n == 0:
        return np.zeros(0, np.float32), np.zeros(0, np.int64)
    if not isinstance(corpus, jax.Array):
        corpus = corpus.astype(np.float32, copy=False)
    e_sharded, _ = shard_corpus(corpus, mesh, axis)
    return sharded_threshold_scan_device(q, e_sharded, n, max_distance, mesh, axis)


def sharded_threshold_scan_device(
    q: np.ndarray,
    e_sharded,
    n_true: int,
    max_distance: float,
    mesh: Mesh,
    axis: str = SHARD_AXIS,
) -> Tuple[np.ndarray, np.ndarray]:
    """Single-query threshold collection over an already mesh-sharded
    device array — a batch of one through
    :func:`sharded_batched_threshold_scan_device` (one distributed
    collection path to maintain; the store serves Q=1 through the same
    code). Rows at global index >= ``n_true`` never match."""
    assert q.shape[0] == 1, "sharded_threshold_scan expects a single query row"
    per = sharded_batched_threshold_scan_device(
        q, e_sharded, n_true, max_distance, mesh, axis
    )
    return per[0]
