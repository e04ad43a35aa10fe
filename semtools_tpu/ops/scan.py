"""TPU similarity scan: tiled ``q @ E^T`` on the MXU + top-k selection.

Replaces the reference's hot inner loop — a per-line SIMD cosine call
(``f32::cosine(query, line)``, src/search/mod.rs:86) — with a single batched
matrix product over the whole corpus. Vectors are stored L2-normalized (or
zero), so cosine similarity is a plain dot product and
``distance = 1 - sim`` matches the reference's output scale
(store.rs:531 uses the same ``1 - score`` conversion).

Zero-vector semantics: an empty line embeds to the zero vector; its dot with
any query is 0, giving distance 1.0 — i.e. "maximally dissimilar but
defined", which ranks it last without poisoning sort order.

Large corpora are processed in fixed-size column chunks so the jit cache
holds a single executable per (Q, chunk) shape and the distance matrix for a
chunk stays small. Each chunk yields its own top-k (values + global indices)
and chunks are merged with one final top-k — the same
partial-top-k-then-merge shape used for the multi-device path in
``semtools_tpu.parallel``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Column-chunk length for the scan; 2^20 rows * 256 dims * 4 B = 1 GB reads
# per chunk, a good grain for HBM streaming while keeping [Q, chunk]
# distance tiles modest for small Q.
SCAN_CHUNK = 1 << 20
# Max chunk programs dispatched ahead of execution in the chunked scan
# (see topk_scan): bounds transient HBM without draining the pipeline.
# 2, not 4: at the capacity-ladder's reduced tier (k ~16k, Q=32, 1M-row
# chunks) one chunk program's sims + block copies + sort-based top_k
# peak near 1 GB on top of the ~4.3 GB resident corpus.
_INFLIGHT_CHUNKS = 2


# Full-f32 accumulation: the default TPU matmul precision truncates inputs
# to bf16, which perturbs distances by ~1e-3 — enough to flip near-ties vs
# the reference's f64 cosine. The scan is HBM-bandwidth-bound for CLI-sized
# query batches, so the extra MXU passes are free; compressed serving
# tiers (ops/int8_scan.py, reduced-int8) trade precision deliberately and
# re-rank against exact f32 values.
_PRECISION = jax.lax.Precision.HIGHEST


@jax.jit
def cosine_distances(q, e):
    """[Q, D] x [N, D] -> [Q, N] cosine distances (inputs unit-or-zero)."""
    sims = jnp.dot(q, e.T, preferred_element_type=jnp.float32, precision=_PRECISION)
    return 1.0 - sims


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_chunk(q, e, base: int, n_true, *, k: int):
    """Per-chunk scan: distances + top-k with global indices.

    Rows with global index >= n_true (padding in pre-padded cached
    corpora) are masked to -inf similarity; n_true is traced, so corpora
    of any true length share one executable per chunk shape.
    """
    sims = jnp.dot(q, e.T, preferred_element_type=jnp.float32, precision=_PRECISION)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, e.shape[0]), 1) + base
    sims = jnp.where(col < n_true, sims, -jnp.inf)
    neg_dist, idx = jax.lax.top_k(sims, k)  # max sim == min distance
    return 1.0 - neg_dist, idx + base


# Block length for the XLA-level two-phase selection (mirrors the Pallas
# kernels' SUB_N): top_k runs over block maxes and k gathered blocks
# instead of the full [Q, N] similarity matrix.
_XLA_BLOCK = 512
# Below this corpus size lax.top_k over the full row is already cheap.
_XLA_BLOCKED_MIN_ROWS = 1 << 15


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_chunk_blocked(q, e, base: int, n_true, *, k: int):
    """Blocked two-phase variant of :func:`_topk_chunk` for batched /
    large-k workloads, where ``lax.top_k`` over the full [Q, N]
    similarity matrix dominates the scan (measured 20x the matmul cost
    at Q=1000, N=100k).

    Phase 1 reduces each 512-column block to its max; a small top_k over
    the [Q, N/512] block maxes picks each query's k candidate blocks
    (exact — a block's rank is its best element's rank, see
    ops/pallas_scan.py); only those k*512 columns see the final top_k.
    Candidate blocks are visited in ascending-index order, so value ties
    still resolve to the lower corpus index exactly like the plain path.

    Requires a 512-row-aligned corpus (the device caches tile-pad to
    multiples of 2048+); padding the sims matrix for unaligned shapes
    costs a full [Q, N] copy that erases the win (measured -10% at
    N=100k/Q=1000 vs +30-50% on aligned shapes).

    Measured device-side (TPU v5e, k=10, repeats folded in one jit):
    N=1M/Q=1024 +49% over plain (17.8k -> 26.5k q/s), N=1M/Q=256 +45%,
    N=1M/Q=64 +30%, N=128k/Q=256 +17%; never slower on aligned shapes.
    """
    qn = q.shape[0]
    n = e.shape[0]
    nb = n // _XLA_BLOCK  # callers guarantee 512-aligned corpora
    sims = jnp.dot(q, e.T, preferred_element_type=jnp.float32, precision=_PRECISION)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) + base
    sims = jnp.where(col < n_true, sims, -jnp.inf)
    blocks = sims.reshape(qn, nb, _XLA_BLOCK)

    k_blocks = min(k, nb)
    _, bids = jax.lax.top_k(jnp.max(blocks, axis=2), k_blocks)  # [Q, kb]
    # Ascending block ids => gathered candidates are in corpus order, so
    # the final top_k's prefer-earlier-position tie-break is the global
    # lower-index tie-break (blocks are distinct; order within is native).
    bids = jnp.sort(bids, axis=1)
    cand = jnp.take_along_axis(blocks, bids[:, :, None], axis=1)  # [Q, kb, B]
    cand_flat = cand.reshape(qn, k_blocks * _XLA_BLOCK)
    neg_dist, pos = jax.lax.top_k(cand_flat, k)
    idx = (
        jnp.take_along_axis(bids, pos // _XLA_BLOCK, axis=1) * _XLA_BLOCK
        + pos % _XLA_BLOCK
    )
    return 1.0 - neg_dist, idx + base


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_chunk_masked(q, e, base: int, n_true, mask, *, k: int):
    """:func:`_topk_chunk` with a per-row keep mask (subset serving).

    ``mask`` is a [chunk_rows] bool device array aligned with ``e``; rows
    where it is False are demoted to -inf similarity and never selected.
    Funds path-subset queries against the full warm slot corpus: the
    mask costs 1 byte/row of HBM next to the 256-1024 B/row the corpus
    itself streams (<0.4% overhead), so a masked scan runs at full-store
    speed without re-gathering or re-uploading the subset rows.
    """
    sims = jnp.dot(q, e.T, preferred_element_type=jnp.float32, precision=_PRECISION)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, e.shape[0]), 1) + base
    keep = (col < n_true) & (mask[None, :] != 0)
    sims = jnp.where(keep, sims, -jnp.inf)
    neg_dist, idx = jax.lax.top_k(sims, k)
    return 1.0 - neg_dist, idx + base


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_chunk_blocked_masked(q, e, base: int, n_true, mask, *, k: int):
    """Masked variant of :func:`_topk_chunk_blocked` (same exactness
    argument: masked entries are -inf, a block's rank is its best
    element's rank, candidate blocks are visited in ascending order)."""
    qn = q.shape[0]
    n = e.shape[0]
    nb = n // _XLA_BLOCK
    sims = jnp.dot(q, e.T, preferred_element_type=jnp.float32, precision=_PRECISION)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) + base
    keep = (col < n_true) & (mask[None, :] != 0)
    sims = jnp.where(keep, sims, -jnp.inf)
    blocks = sims.reshape(qn, nb, _XLA_BLOCK)

    k_blocks = min(k, nb)
    _, bids = jax.lax.top_k(jnp.max(blocks, axis=2), k_blocks)
    bids = jnp.sort(bids, axis=1)
    cand = jnp.take_along_axis(blocks, bids[:, :, None], axis=1)
    cand_flat = cand.reshape(qn, k_blocks * _XLA_BLOCK)
    neg_dist, pos = jax.lax.top_k(cand_flat, k)
    idx = (
        jnp.take_along_axis(bids, pos // _XLA_BLOCK, axis=1) * _XLA_BLOCK
        + pos % _XLA_BLOCK
    )
    return 1.0 - neg_dist, idx + base


@functools.partial(jax.jit, static_argnames=("k",))
def _merge_topk(dists, idxs, *, k: int):
    """Merge per-chunk candidates [Q, C*k] -> global top-k [Q, k].

    Ties are broken toward the lower global index (stable w.r.t. corpus
    order, matching the reference's stable sort at src/search/mod.rs:107).
    """
    # lax.top_k on -distance prefers earlier positions on ties; candidates
    # are already ordered by chunk, i.e. by global index.
    neg, pos = jax.lax.top_k(-dists, k)
    return -neg, jnp.take_along_axis(idxs, pos, axis=1)


def _use_pallas(n: int, k: int, qn: int) -> bool:
    """Route large-corpus scans through the fused Pallas kernel on TPU.

    The fused kernel keeps selection in VMEM (no [Q, N] HBM round-trip); it
    pays off once the corpus spans multiple tiles. Its per-tile extraction
    unrolls k rounds and the two-phase rescan re-reads Q*k tiles, so very
    large k or batch-query workloads stay on the XLA path. Opt out with
    SEMTOOLS_TPU_NO_PALLAS=1.
    """
    import os

    if os.environ.get("SEMTOOLS_TPU_NO_PALLAS"):
        return False
    if k > 64 or qn > 32:
        # Measured crossover: at Q=256/N=100k XLA's matmul+top_k (15 ms)
        # beats the K-round Pallas extraction (90 ms); selection cost per
        # element scales with Q.
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except RuntimeError:
        return False
    from semtools_tpu.ops.pallas_scan import TILE_N

    return n >= 2 * TILE_N


def chunk_for_shape(n_rows: int, masked: bool = False):
    """The per-chunk top-k callable for a corpus of ``n_rows`` rows:
    blocked two-phase when the chunk is big enough that ``lax.top_k``
    over the full row dominates (batched queries, large k) AND
    512-aligned (unaligned shapes would pay a full sims-pad copy);
    otherwise the plain matmul+top_k chunk. ``masked=True`` selects the
    variants taking a per-row keep mask (subset serving)."""
    if n_rows >= _XLA_BLOCKED_MIN_ROWS and n_rows % _XLA_BLOCK == 0:
        return _topk_chunk_blocked_masked if masked else _topk_chunk_blocked
    return _topk_chunk_masked if masked else _topk_chunk


def topk_scan(
    q, e, k: int, n_true: Optional[int] = None, mask=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k nearest lines for each query row.

    q: [Q, D] float32 (unit-or-zero rows)
    e: [N, D] float32 (unit-or-zero rows); rows at index >= ``n_true``
       (default: all rows are real) are padding and never selected —
       pre-padded device-cached corpora avoid a per-query re-pad copy.
    mask: optional [N] bool (device) array; rows where it is False are
       never selected (path-subset serving). Fewer than k selectable
       rows surface as +inf-distance entries — callers drop non-finite
       results. Masked scans take the XLA path (the fused Pallas kernels
       have no mask operand; the mask costs <0.4% extra HBM traffic).
    Returns (distances [Q, k'], indices [Q, k']) with k' = min(k, n_true),
    sorted ascending by distance; ties keep corpus order.
    """
    n = e.shape[0] if n_true is None else min(n_true, e.shape[0])
    k_eff = min(k, n)
    if k_eff == 0:
        qn = np.shape(q)[0]
        return (np.zeros((qn, 0), np.float32), np.zeros((qn, 0), np.int64))

    if mask is None and _use_pallas(n, k_eff, int(np.shape(q)[0])):
        from semtools_tpu.ops.pallas_scan import pallas_topk_scan

        return pallas_topk_scan(q, e, k_eff, n_true=n)

    if e.shape[0] <= SCAN_CHUNK:
        fn = chunk_for_shape(e.shape[0], masked=mask is not None)
        args = (q, e, 0, n) if mask is None else (q, e, 0, n, mask)
        d, i = fn(*args, k=k_eff)
        return np.asarray(d), np.asarray(i)

    # RUNNING top-k merge, not accumulate-all-then-merge: at capacity
    # scale the accumulated parts ([Q, n_chunks*k] for k ~16k) plus the
    # final concatenate + sort-based merge spiked hundreds of MB on top
    # of the in-flight chunk programs and the resident corpus — the r5
    # ladder's 60M-row reduced hop OOM'd the 16 GB chip three different
    # ways here (readback, concat, merge) until both the window and the
    # merge became incremental. Each step merges [Q, <=2k] — O(k) state.
    # Ties stay stable toward the lower corpus index: chunks arrive in
    # index order, the running best keeps tied entries in insertion
    # order (lax.top_k prefers earlier positions), and new chunks are
    # concatenated AFTER the best so far.
    best_d = best_i = None
    for ci, start in enumerate(range(0, e.shape[0], SCAN_CHUNK)):
        chunk = e[start : start + SCAN_CHUNK]
        kk = min(k_eff, chunk.shape[0])
        fn = chunk_for_shape(chunk.shape[0], masked=mask is not None)
        if mask is None:
            d, i = fn(q, chunk, start, n, k=kk)
        else:
            d, i = fn(q, chunk, start, n, mask[start : start + chunk.shape[0]], k=kk)
        if best_d is None:
            best_d, best_i = d, i
        else:
            cat_d = jnp.concatenate([best_d, d], axis=1)
            cat_i = jnp.concatenate([best_i, i], axis=1)
            best_d, best_i = _merge_topk(
                cat_d, cat_i, k=min(k_eff, cat_d.shape[1])
            )
        # Bound in-flight device memory: each dispatched-but-unexecuted
        # chunk program pins its corpus slice copy + the f32 promote +
        # the [Q, chunk] sims + its top_k sort temps. Unbounded async
        # dispatch at capacity scale (60M-row reduced corpus = 60 chunks
        # x ~1 GB transients on a chip already holding the ~4.3 GB
        # resident corpus) OOMs the 16 GB HBM. A small window keeps the
        # pipeline full while capping transients.
        if (ci + 1) % _INFLIGHT_CHUNKS == 0:
            jax.block_until_ready(best_d)
    return np.asarray(best_d), np.asarray(best_i)


@jax.jit
def _threshold_dists(q, e, n_true):
    """[N] distances with rows >= n_true masked to inf (kept ON DEVICE so
    count and compaction read the SAME values — separately compiled
    matmuls could disagree by an ulp around the threshold)."""
    sims = jnp.dot(q, e.T, preferred_element_type=jnp.float32, precision=_PRECISION)
    d = 1.0 - sims[0]
    col = jnp.arange(d.shape[0])
    return jnp.where(col < n_true, d, jnp.inf)


@jax.jit
def _threshold_count(d, t):
    return jnp.sum(d < t)


@functools.partial(jax.jit, static_argnames=("size",))
def _threshold_extract(d, t, *, size: int):
    """Compact the hits on device: only [size] (dists, idx) leave the chip,
    sorted ascending by (distance, index); misses fill with (inf, N)."""
    hit = d < t
    idx = jnp.where(hit, size=size, fill_value=d.shape[0])[0]
    vals = jnp.where(idx < d.shape[0], d[jnp.minimum(idx, d.shape[0] - 1)], jnp.inf)
    sv, si = jax.lax.sort((vals, idx.astype(jnp.int32)), dimension=0, num_keys=2)
    return sv, si


# Above this corpus size the full [N] distance vector is worth keeping on
# device and compacting there (the host download of N f32 dominates on
# transfer-limited hosts).
_THRESHOLD_DEVICE_MIN_ROWS = 1 << 16


@functools.partial(jax.jit, static_argnames=("size",))
def _batched_threshold_extract(q, e, t, n_true, *, size: int):
    """[Q] hit counts + each query's ``size`` nearest (dists, idx),
    ascending, ties toward the lower corpus index. One matmul + one
    top_k — hits beyond ``size`` are absent (callers grow size)."""
    sims = jnp.dot(q, e.T, preferred_element_type=jnp.float32, precision=_PRECISION)
    d = 1.0 - sims
    col = jax.lax.broadcasted_iota(jnp.int32, (1, e.shape[0]), 1)
    d = jnp.where(col < n_true, d, jnp.inf)
    counts = jnp.sum(d < t, axis=1)
    neg, idx = jax.lax.top_k(-d, size)  # ascending distance; ties keep order
    return counts, -neg, idx


@functools.partial(jax.jit, static_argnames=("size",))
def _batched_threshold_extract_masked(q, e, t, n_true, mask, *, size: int):
    """:func:`_batched_threshold_extract` with a per-row keep mask —
    excluded rows read as +inf distance, so they neither count as hits
    nor surface in the extraction (path-subset serving)."""
    sims = jnp.dot(q, e.T, preferred_element_type=jnp.float32, precision=_PRECISION)
    d = 1.0 - sims
    col = jax.lax.broadcasted_iota(jnp.int32, (1, e.shape[0]), 1)
    keep = (col < n_true) & (mask[None, :] != 0)
    d = jnp.where(keep, d, jnp.inf)
    counts = jnp.sum(d < t, axis=1)
    neg, idx = jax.lax.top_k(-d, size)
    return counts, -neg, idx


def batched_threshold_scan(
    q, e, max_distance: float, n_true: Optional[int] = None, mask=None
):
    """Threshold mode for a BATCH of queries in O(1) device dispatches.

    The reference's threshold semantics (src/search/mod.rs:113-119 —
    strict ``distance < max_distance``, unbounded hit count, threshold
    overrides top-k) per query row. Returns a list of (distances [M_i],
    indices [M_i]) pairs, ascending, ties toward the lower corpus index.

    Implementation: one matmul + per-row hit counts, then one
    ``lax.top_k`` sized to the LARGEST row's hit count (pow2-bucketed so
    nearby workloads share executables), sliced per row on host. Serves
    the batched-agent / daemon use the single-query
    :func:`threshold_scan` would pay Q dispatch round-trips for.
    ``mask`` (optional [N] bool device array) excludes rows from both the
    hit count and the extraction — path-subset serving.
    """
    q = jnp.asarray(q, jnp.float32)
    e = jnp.asarray(e)
    n = e.shape[0] if n_true is None else min(n_true, e.shape[0])
    qn = q.shape[0]
    if n == 0 or qn == 0:
        return [(np.zeros(0, np.float32), np.zeros(0, np.int64))] * qn

    size = 64
    while True:
        size = min(size, e.shape[0])
        if mask is None:
            counts, dists, idxs = _batched_threshold_extract(
                q, e, float(max_distance), n, size=size
            )
        else:
            counts, dists, idxs = _batched_threshold_extract_masked(
                q, e, float(max_distance), n, mask, size=size
            )
        counts = np.asarray(counts)
        if counts.max(initial=0) <= size or size >= e.shape[0]:
            break
        size = 1 << int(counts.max() - 1).bit_length()

    dists = np.asarray(dists)
    idxs = np.asarray(idxs)
    return [
        (dists[i, : counts[i]], idxs[i, : counts[i]].astype(np.int64))
        for i in range(qn)
    ]


def threshold_scan(q, e, max_distance: float, n_true: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """All (query, line) pairs with distance strictly below ``max_distance``.

    Mirrors the reference's threshold mode, which returns an unbounded number
    of hits (src/search/mod.rs:113-119: the threshold overrides top-k).
    Returns (distances [M], flat indices [M]) for Q == 1 queries, ascending.
    Rows at index >= ``n_true`` are padding and excluded.
    """
    assert q.shape[0] == 1, "threshold_scan expects a single query row"
    n = e.shape[0] if n_true is None else min(n_true, e.shape[0])

    if e.shape[0] >= _THRESHOLD_DEVICE_MIN_ROWS:
        # Device-side compaction: one corpus matmul, then transfer one
        # scalar + the hits instead of the whole [N] distance vector.
        dd = _threshold_dists(jnp.asarray(q, jnp.float32), jnp.asarray(e), n)
        count = int(_threshold_count(dd, float(max_distance)))
        if count == 0:
            return np.zeros(0, np.float32), np.zeros(0, np.int64)
        size = 1 << (count - 1).bit_length()  # pow2 buckets bound recompiles
        size = min(size, e.shape[0])
        sv, si = _threshold_extract(dd, float(max_distance), size=size)
        sv = np.asarray(sv)[:count]
        si = np.asarray(si)[:count].astype(np.int64)
        return sv, si

    dists = np.asarray(cosine_distances(q, e))[0]
    dists = dists[:n]
    keep = np.nonzero(dists < max_distance)[0]
    order = np.argsort(dists[keep], kind="stable")
    keep = keep[order]
    return dists[keep], keep
