"""Slot-space device corpus with O(changed-bytes) in-place patching.

The plain device cache keys whole-corpus entries by (dir, generation), so
ANY mutation — a one-line edit in a 10M-line workspace — re-gathers and
re-uploads the full corpus. This module keeps the corpus on device in
SLOT space (device row == mmap slot; freed slots are zero rows) and
patches it in place when the store's generation moves:

- the copy-on-write upsert (store.py) gives every changed document a
  fresh slot range, so the layout diff identifies exactly the moved
  ranges;
- freed ranges are zeroed on device (no host transfer), new ranges are
  uploaded and written with ``lax.dynamic_update_slice`` in power-of-two
  row chunks (bounded executable count, donated operands — no device-side
  corpus copy);
- growth reallocates on device and block-copies the old corpus
  device-to-device.

Zero rows score similarity 0 (cosine distance 1.0), so they can only
outrank real rows whose similarity is negative. Callers oversample by a
small slack, drop invalid slots host-side (the layout is known), and fall
back to the compact gather path in the rare case the slack was not
enough — results stay exact in all cases.

Serving kinds: "f32" (exact scan), "int8" (global-scale quantized +
exact rerank), reduced-int8 (PCA-projected capacity tier), and "int4"
(half-byte packed, 128 B/row at D=256 — the throughput tier; served via
ops.int4_scan's deep-candidate extraction + exact rerank). Patched rows
reuse the entry's quantization scale and rotation; values are clipped,
and the exact f32 rerank keeps reported distances exact. To bound
transform drift on mutating corpora, lossy entries stop accepting
patches once cumulative patched rows exceed 25% of the corpus — the
resulting rebuild refits rotation and scale on current content.

Int4's "zero row" is NOT the zero byte: the packed format biases the low
nibble, so freed slots are filled with PACKED_ZERO_BYTE (0x08) rows —
the packed encoding of the zero vector (see ops.int4_scan) — keeping the
freed-slots-score-similarity-0 invariant every serving path relies on.
"""

from __future__ import annotations

import functools
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from semtools_tpu.store import device_cache

_SLACK = 16  # extra candidates to absorb zero-slot wins

# Residual-scale headroom for the reduced tier: resid_scale is fitted so
# the build's largest residual quantizes to ~85 of 127, leaving room for
# later-patched rows with somewhat larger residuals before a rebuild
# refit is forced (ceil quantization keeps the stored value an upper
# bound either way).
_RESID_HEADROOM = 1.5

# Test instrumentation: bytes shipped host->device by patch/build ops.
_uploaded = [0]

def _donate_args():
    """Donate the corpus operand on accelerators (in-place update, no
    device-side copy); CPU does not support donation and warns."""
    try:
        import jax

        return (0,) if jax.default_backend() != "cpu" else ()
    except Exception:
        return ()



def uploaded_bytes() -> int:
    return _uploaded[0]


@dataclass
class SlotCorpus:
    kind: str  # "f32" | "int8" | "int4" (int4 corpus is [cap, D/2] packed)
    generation: int
    capacity: int  # true slot count (scan n_true); corpus rows >= this
    corpus: object  # device array [cap_padded, D']
    scale: Optional[float]
    rotation: Optional[np.ndarray]
    layout: Dict[str, Tuple[int, int]]
    # Residual-norm column scale (reduced tier only). The stored corpus
    # is [cap, rd+1]: columns [0, rd) are the int8-quantized projection,
    # column rd is ceil(||x_perp|| / resid_scale) — each row's OWN
    # projection-residual norm, rounded UP. Serving augments the query
    # with q_perp * resid_scale / scale, so the same MXU matmul scores
    # the OPTIMISTIC similarity bound q_r.x_r + q_perp*r_i >= q.x —
    # selection by that bound gives a HARD per-row completion
    # certificate (1 - bound is a true lower bound on every row's exact
    # distance, up to the int8 rounding of the projection columns).
    # This replaced the r4 outlier-set design (resid_hi_slots +
    # statistical alignment margin), which a clustered corpus with more
    # cluster directions than rd beats SYSTEMATICALLY: cluster structure
    # spills into the residual and aligns with in-cluster queries
    # (measured recall 0.81 at 932k rows / 186 clusters / rd=64 before
    # this redesign — the r5 capacity-ladder smoke).
    resid_scale: Optional[float] = None
    # Max over corpus rows of sum(|int8 value|) — turns the fused
    # kernel's query-quantization error into a hard bound
    # (0.5 * q_scale * scale * max_row_int_l1). int8 kinds only.
    max_row_int_l1: float = 0.0
    mesh: object = None  # jax Mesh when the corpus is row-sharded
    starts: np.ndarray = field(default=None)  # slot-ordered range starts
    ends: np.ndarray = field(default=None)
    paths: List[str] = field(default=None)
    # Per-slot content hashes AT THIS ENTRY'S GENERATION (uint64, 0 =
    # unknown; None when the store predates the lines.h64 sidecar). The
    # row-level patch diff matches a changed document's new hashes
    # against its old block here and moves unchanged rows DEVICE-SIDE
    # (gather+scatter, zero host bytes) instead of re-uploading them —
    # the mmap's own sidecar can't serve this role because copy-on-write
    # frees (and may re-use) the old block before the next patch runs.
    hashes: Optional[np.ndarray] = None
    # Embedding provenance at snapshot time. A content hash identifies a
    # LINE, not its vectors: re-embedding unchanged text under a new
    # model (first-run hub download landing, meta 'model' swap) or a
    # bumped per-doc embedding version produces different vectors with
    # identical hashes, so a hash-matched device MOVE would serve stale
    # encodings. Moves are only trusted while the store's model and the
    # document's stored version both still equal this snapshot.
    model: Optional[str] = None
    doc_versions: Optional[Dict[str, int]] = None
    # Rows written through _patch since the entry's rotation/scale were
    # fit. Patched rows reuse the BUILD-time transform, so a corpus that
    # drifts topically accumulates representation error; once this
    # exceeds a quarter of the corpus the entry refuses further patches
    # and the rebuild refits (see _patch). Exact f32 entries never drift.
    patched_rows: int = 0

    @property
    def device_nbytes(self) -> int:
        """PER-DEVICE bytes — what the LRU budget must account, since a
        mesh-sharded corpus holds 1/n of its rows on each device (the fit
        policy approves corpora up to budget x mesh size)."""
        try:
            total = int(self.corpus.size) * self.corpus.dtype.itemsize
        except Exception:
            return 0
        n_dev = int(self.mesh.devices.size) if self.mesh is not None else 1
        return total // max(n_dev, 1)

    def refresh_lookup(self) -> None:
        items = sorted(self.layout.items(), key=lambda kv: kv[1][0])
        self.paths = [p for p, _ in items]
        self.starts = np.array([v[0] for _, v in items], np.int64)
        self.ends = np.array([v[0] + v[1] for _, v in items], np.int64)

    def slot_owners(self, slots: np.ndarray):
        """(valid mask, range index, line number) for scan-result slots."""
        ris = np.searchsorted(self.starts, slots, side="right") - 1
        ris_c = np.clip(ris, 0, len(self.starts) - 1)
        valid = (ris >= 0) & (slots < self.ends[ris_c]) & (slots >= self.starts[ris_c])
        return valid, ris_c, slots - self.starts[ris_c]


def _out_sharding(mesh):
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semtools_tpu.parallel.mesh import SHARD_AXIS

    return NamedSharding(mesh, P(SHARD_AXIS, None))


@functools.lru_cache(maxsize=64)
def _dus_jit(rows: int, cols: int, dtype: str, mesh=None):
    import jax
    import jax.numpy as jnp

    # rows/cols/dtype are cache keys; the shapes specialize the trace
    def f(arr, block, start):
        return jax.lax.dynamic_update_slice(arr, block, (start, 0))

    return jax.jit(
        f, donate_argnums=_donate_args(), out_shardings=_out_sharding(mesh)
    )


@functools.lru_cache(maxsize=64)
def _zero_jit(rows: int, cols: int, dtype: str, mesh=None, fill: int = 0):
    import jax
    import jax.numpy as jnp

    def f(arr, start):
        block = jnp.full((rows, cols), fill, arr.dtype)
        return jax.lax.dynamic_update_slice(arr, block, (start, 0))

    return jax.jit(
        f, donate_argnums=_donate_args(), out_shardings=_out_sharding(mesh)
    )


@functools.lru_cache(maxsize=16)
def _grow_jit(new_rows: int, cols: int, dtype: str, mesh=None, fill: int = 0):
    import jax
    import jax.numpy as jnp

    def f(arr):
        out = jnp.full((new_rows, arr.shape[1]), fill, arr.dtype)
        return jax.lax.dynamic_update_slice(out, arr, (0, 0))

    return jax.jit(
        f, donate_argnums=_donate_args(), out_shardings=_out_sharding(mesh)
    )


def _pow2_chunks(n: int):
    """Descending power-of-two chunk sizes summing to n."""
    while n > 0:
        c = 1 << (n.bit_length() - 1)
        yield c
        n -= c


@functools.lru_cache(maxsize=64)
def _slice_rows_jit(rows: int, cols: int, dtype: str, mesh=None):
    """Snapshot ``rows`` contiguous rows starting at a dynamic offset."""
    import jax

    def f(arr, start):
        return jax.lax.dynamic_slice(arr, (start, 0), (rows, arr.shape[1]))

    out_s = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        out_s = NamedSharding(mesh, P(None, None))
    return jax.jit(f, out_shardings=out_s)


def _move_runs(src: np.ndarray, dst: np.ndarray):
    """Split an index-aligned move into maximal contiguous runs (both
    src and dst advancing by 1). A line edit moves two huge runs; an
    interleaved shuffle degenerates to many short ones."""
    if not len(src):
        return []
    brk = np.nonzero((np.diff(src) != 1) | (np.diff(dst) != 1))[0] + 1
    starts = np.concatenate([[0], brk])
    ends = np.concatenate([brk, [len(src)]])
    return [
        (int(src[a]), int(dst[a]), int(b - a)) for a, b in zip(starts, ends)
    ]


@functools.lru_cache(maxsize=64)
def _gather_rows_jit(count: int, cols: int, dtype: str, mesh=None):
    """Snapshot ``count`` rows by index (device-side; no host transfer).
    Output replicated so the later scatter's operand is mesh-agnostic."""
    import jax

    def f(arr, idx):
        return arr[idx]

    out_s = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        out_s = NamedSharding(mesh, P(None, None))
    return jax.jit(f, out_shardings=out_s)


@functools.lru_cache(maxsize=64)
def _scatter_rows_jit(count: int, cols: int, dtype: str, mesh=None):
    """Write ``count`` rows at arbitrary slot indices (donated corpus)."""
    import jax

    def f(arr, idx, rows):
        return arr.at[idx].set(rows)

    return jax.jit(
        f, donate_argnums=(0,) if _donate_args() else (),
        out_shardings=_out_sharding(mesh),
    )


def _pad_pow2(a: np.ndarray, axis0: int) -> np.ndarray:
    """Pad axis 0 to the next power of two by repeating the last element
    (idempotent for gather/scatter: the duplicate writes the same row)."""
    n = a.shape[0]
    target = 1 << max(n - 1, 0).bit_length() if n else 0
    if target == n:
        return a
    reps = np.repeat(a[-1:], target - n, axis=0)
    return np.concatenate([a, reps], axis=0)


def _scatter_upload(arr, rows_np: np.ndarray, dst: np.ndarray, mesh=None):
    """Upload rows and write them at arbitrary (non-contiguous) slots."""
    import jax.numpy as jnp

    rows_p = _pad_pow2(np.ascontiguousarray(rows_np), 0)
    dst_p = _pad_pow2(np.asarray(dst, np.int32), 0)
    _uploaded[0] += rows_p.nbytes + dst_p.nbytes
    return _scatter_rows_jit(len(dst_p), arr.shape[1], str(arr.dtype), mesh)(
        arr, jnp.asarray(dst_p), jnp.asarray(rows_p)
    )


def _write_rows(arr, rows_np: np.ndarray, start: int, mesh=None):
    """Upload rows and write them at [start:start+n] in pow2 chunks."""
    import jax.numpy as jnp

    off = 0
    for c in _pow2_chunks(rows_np.shape[0]):
        block = np.ascontiguousarray(rows_np[off : off + c])
        _uploaded[0] += block.nbytes
        arr = _dus_jit(c, arr.shape[1], str(arr.dtype), mesh)(
            arr, jnp.asarray(block), start + off
        )
        off += c
    return arr


def _zero_rows(arr, start: int, length: int, mesh=None, fill: int = 0):
    off = 0
    for c in _pow2_chunks(length):
        arr = _zero_jit(c, arr.shape[1], str(arr.dtype), mesh, fill)(
            arr, start + off
        )
        off += c
    return arr


def _fill_byte(kind: str) -> int:
    """Freed-slot fill: the encoding of the zero VECTOR for this kind."""
    if kind == "int4":
        from semtools_tpu.ops.int4_scan import PACKED_ZERO_BYTE

        return PACKED_ZERO_BYTE
    return 0


def _tile(cap: int, kind: str = "int8") -> int:
    if kind == "int4":
        from semtools_tpu.ops.int4_scan import tile_for_rows as tile4

        return tile4(max(cap, 1))
    from semtools_tpu.ops.int8_scan import tile_for_rows

    return tile_for_rows(max(cap, 1))


def _padded_rows(cap: int, mesh=None, kind: str = "int8") -> int:
    """Device rows for a capacity: tile-multiple (Pallas grids floor at
    tile boundaries), a mesh-size multiple when sharded, and bucketed in
    coarse steps (parallel.mesh.bucket_rows) so capacity growth keeps the
    padded SHAPE stable across many mutations — the scan executables key
    on shapes with n_true traced."""
    if not cap:
        return 0
    from semtools_tpu.parallel.mesh import bucket_rows

    n_dev = int(mesh.devices.size) if mesh is not None else 1
    padded = bucket_rows(cap, n_dev)
    t = _tile(padded, kind)
    padded = ((padded + t - 1) // t) * t
    if mesh is not None:
        padded = ((padded + n_dev - 1) // n_dev) * n_dev
    return padded


def _resid_bytes(r: np.ndarray, resid_scale) -> np.ndarray:
    """Residual norms -> ceil-quantized column bytes (upper bounds)."""
    if not resid_scale:
        return np.zeros(r.shape, np.int8)
    return np.clip(np.ceil(r / resid_scale), 0, 127).astype(np.int8)


def _transform(rows: np.ndarray, kind: str, rotation, scale,
               resid_scale=None) -> np.ndarray:
    rows = np.asarray(rows, np.float32)
    if rotation is not None:
        proj = rows @ rotation
        r = np.sqrt(np.maximum(
            np.einsum("ij,ij->i", rows, rows)
            - np.einsum("ij,ij->i", proj, proj), 0.0,
        ))
        q = (np.clip(np.rint(proj / scale), -127, 127).astype(np.int8)
             if scale else np.zeros(proj.shape, np.int8))
        return np.concatenate([q, _resid_bytes(r, resid_scale)[:, None]], axis=1)
    if kind == "int8":
        if not scale:
            return np.zeros(rows.shape, np.int8)
        return np.clip(np.rint(rows / scale), -127, 127).astype(np.int8)
    if kind == "int4":
        from semtools_tpu.ops.int4_scan import PACKED_ZERO_BYTE, pack_int4

        if not scale:
            return np.full(
                (rows.shape[0], rows.shape[1] // 2), PACKED_ZERO_BYTE, np.int8
            )
        q = np.clip(np.rint(rows / scale), -7, 7).astype(np.int8)
        return pack_int4(q)
    return rows


def _device_put(buf: np.ndarray, mesh):
    """Upload the slot corpus — row-sharded over the mesh when given."""
    import jax
    import jax.numpy as jnp

    _uploaded[0] += buf.nbytes
    if mesh is None:
        return jnp.asarray(buf)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semtools_tpu.parallel.mesh import SHARD_AXIS

    return jax.device_put(buf, NamedSharding(mesh, P(SHARD_AXIS, None)))


_BUILD_CHUNK_ROWS = 1 << 20  # 1 GB of f32 at D=256 per streamed chunk


def _occupied_slot_chunks(mm, ranges, chunk_rows: int):
    """Yield (slot_start, [rows, D] f32 slot-space block) covering
    [0, cap) in ``chunk_rows`` steps: occupied slots copied from the
    mmap, unoccupied slots zero — the same slot-space image the
    full-buffer assembly produced, without ever materializing it."""
    cap = mm.shape[0]
    spans = sorted((s, s + n) for _, s, n, _rev in ranges if n)
    si = 0
    for c0 in range(0, cap, chunk_rows):
        c1 = min(c0 + chunk_rows, cap)
        block = np.zeros((c1 - c0, mm.shape[1]), np.float32)
        while si < len(spans) and spans[si][1] <= c0:
            si += 1
        j = si
        while j < len(spans) and spans[j][0] < c1:
            s, e = max(spans[j][0], c0), min(spans[j][1], c1)
            block[s - c0 : e - c0] = mm[s:e]
            j += 1
        yield c0, block


def _sample_occupied(mm, ranges, sample_rows: int, seed: int = 0) -> np.ndarray:
    """Up to ``sample_rows`` occupied rows for rotation fitting. The
    second-moment fit is row-order invariant, so gathering spans in slot
    order matches the full-buffer fit exactly whenever every occupied row
    is taken (zero slots contribute nothing to an uncentered moment)."""
    spans = sorted((s, s + n) for _, s, n, _rev in ranges if n)
    total = sum(e - s for s, e in spans)
    if total <= sample_rows:
        return np.concatenate([np.asarray(mm[s:e]) for s, e in spans]) \
            if spans else np.zeros((0, mm.shape[1]), np.float32)
    rng = np.random.default_rng(seed)
    starts = np.array([s for s, _ in spans], np.int64)
    lens = np.array([e - s for s, e in spans], np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    # Sample without replacement by rejection: numpy's replace=False
    # materializes a full permutation of the population (~480 MB of
    # int64 plus a shuffle at 60M rows), breaking the build's
    # O(chunk + output) memory contract. sample_rows << total on the
    # sizes where this path runs, so rejection converges in ~1 round.
    chosen: set = set()
    while len(chosen) < sample_rows:
        need = sample_rows - len(chosen)
        for v in rng.integers(0, total, size=need + need // 8 + 16).tolist():
            if len(chosen) >= sample_rows:
                break
            chosen.add(v)
    picks = np.sort(np.fromiter(chosen, np.int64, len(chosen)))
    span_of = np.searchsorted(offs, picks, side="right") - 1
    slots = starts[span_of] + (picks - offs[span_of])
    return np.asarray(mm[slots])


_HOST_XFORM_BPS = [None]  # calibrated host assemble+quantize bytes/s


def _host_transform_rate() -> float:
    """Measured host-side build throughput (f32 corpus bytes/s through
    quantize_global), calibrated once per process on a 32 MB sample."""
    if _HOST_XFORM_BPS[0] is None:
        import time as _t

        from semtools_tpu.ops.int8_scan import quantize_global

        x = np.random.default_rng(0).standard_normal(
            (1 << 17, 64)).astype(np.float32)
        t0 = _t.monotonic()
        quantize_global(x)
        _HOST_XFORM_BPS[0] = x.nbytes / max(_t.monotonic() - t0, 1e-6)
    return _HOST_XFORM_BPS[0]


_UP_PROBE = [0.0, 0.0]  # (monotonic stamp, measured bytes/s)


def _large_up_bps() -> Optional[float]:
    """Host->device bytes/s for BULK transfers (8 MB probe, cached 2 min).

    The 256 kB probe host_embed keeps for its own policies is
    latency-dominated on tunneled links: this host measured ~500 MB/s on
    GB-scale uploads while the small probe reported single-digit MB/s,
    which silently routed every cold build to the 1-core host path. Bulk
    builds upload 1 GB chunks, so an 8 MB probe (still amortizing the
    per-transfer overhead poorly) is a conservative LOWER bound on their
    realized rate. The 8 MB probe is only paid when the small probe
    already shows a link healthy enough that it costs under ~2 s."""
    import time as _t

    if _UP_PROBE[1] and _t.monotonic() - _UP_PROBE[0] < 120.0:
        return _UP_PROBE[1]
    from semtools_tpu.ops.host_embed import _link_bandwidth

    bw = _link_bandwidth()
    if bw is None:
        return None
    if bw["up_Bps"] < 5e6:
        return bw["up_Bps"]  # degraded link: don't pay an 8 MB probe
    try:
        import jax.numpy as jnp

        # Two back-to-back probes, max-take: the first pays any one-time
        # transfer-path setup cost (and absorbs a transient stall), so a
        # single unlucky probe can no longer misroute every cold build in
        # the cache window to the 1-core host path.
        payload = np.zeros(1 << 21, np.float32)
        rate = 0.0
        for _ in range(2):
            t0 = _t.monotonic()
            jnp.asarray(payload).block_until_ready()
            rate = max(rate, payload.nbytes / max(_t.monotonic() - t0, 1e-6))
    except Exception:
        return bw["up_Bps"]
    _UP_PROBE[0] = _t.monotonic()
    _UP_PROBE[1] = rate
    return rate


def _record_realized_up_bps(nbytes: int, seconds: float) -> None:
    """Fold realized bulk-upload throughput (from an actual device build)
    back into the probe cache: GB-scale transfers are the ground truth
    the 8 MB probe only approximates."""
    import time as _t

    if nbytes >= (1 << 25) and seconds > 0:
        _UP_PROBE[0] = _t.monotonic()
        _UP_PROBE[1] = max(_UP_PROBE[1], nbytes / seconds)


def _device_build_wins(corpus_bytes: int, out_bytes: int, up_bps: float,
                       host_bps: float) -> bool:
    """Pure cost model comparing both paths' TOTAL wall-clock.

    Device path: the f32 image crosses the link twice (stats pass +
    transform pass); the transform itself runs at HBM rate (free by
    comparison). Host path: the 1-core transform, plus uploading the
    finished quantized image to the device cache — omitting that term
    made placements near the crossover pick the slower path."""
    dev = 2.0 * corpus_bytes / max(up_bps, 1e-9)
    host = corpus_bytes / max(host_bps, 1e-9) + out_bytes / max(up_bps, 1e-9)
    return dev < host


def _quantized_out_bytes(kind: str, cap: int, dim: int,
                         reduced_dim: Optional[int]) -> int:
    """Bytes of the finished quantized image the host path must upload."""
    d = (reduced_dim + 1) if reduced_dim else dim  # +1: residual column
    if kind == "int4":
        d = dim // 2
    return cap * d  # 1 byte/stored-dim for int8/int4-packed


def _use_device_build(kind: str, cap: int, dim: int, mesh,
                      reduced_dim: Optional[int] = None) -> bool:
    """Cold-build placement policy (SEMTOOLS_TPU_BUILD=device|host|auto).

    The transform work (project/quantize/pack) is embarrassingly
    parallel and the device does it at HBM rate; the cost of the device
    path is shipping the f32 image over the link twice (amax/residual
    pass + transform pass). Auto compares that against the calibrated
    host transform rate — on a healthy link the device build wins by an
    order of magnitude at capacity-ladder sizes (measured: 14M-row int8
    cold build 728 s host-side on this host's one core), on a degraded
    tunnel the host path wins and auto stays there. Mesh builds keep the
    host path (per-shard device writes aren't worth the complexity)."""
    import os as _os

    mode = _os.environ.get("SEMTOOLS_TPU_BUILD", "auto").lower()
    if mode == "host" or mesh is not None or kind == "f32":
        return False
    if mode == "device":
        return True
    try:
        import jax

        if jax.default_backend() == "cpu":
            return False
        up = _large_up_bps()
        if up is None:
            return False
        return _device_build_wins(
            cap * dim * 4,
            _quantized_out_bytes(kind, cap, dim, reduced_dim),
            up, _host_transform_rate(),
        )
    except Exception:
        return False


def _device_build_corpus(mm, ranges, cap, padded, kind, reduced_dim,
                         rotation):
    """Device-side transform passes: stream f32 slot-space chunks up the
    link, compute amax/residual stats and the transformed corpus on the
    accelerator. Returns (device corpus [padded, D'], scale, resid_scale,
    max_row_int_l1). Raises on any device trouble — the caller falls back
    to the host path."""
    import jax
    import jax.numpy as jnp

    d = mm.shape[1]
    chunk = _BUILD_CHUNK_ROWS
    n_chunks = max((padded + chunk - 1) // chunk, 1)
    w_dev = jnp.asarray(rotation) if rotation is not None else None

    @jax.jit
    def pass1(state, block):
        amax, max_r = state
        if w_dev is not None:
            proj = block @ w_dev
            amax = jnp.maximum(amax, jnp.max(jnp.abs(proj)))
            r2 = jnp.maximum(
                jnp.sum(block * block, axis=1)
                - jnp.sum(proj * proj, axis=1), 0.0)
            max_r = jnp.maximum(max_r, jnp.sqrt(jnp.max(r2)))
        else:
            amax = jnp.maximum(amax, jnp.max(jnp.abs(block)))
        return amax, max_r

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pass2(carry, block, scale, rscale, c0):
        buf, l1 = carry
        x = block @ w_dev if w_dev is not None else block
        lim = 127 if kind == "int8" else 7
        q = jnp.clip(jnp.rint(x / scale), -lim, lim).astype(jnp.int32)
        if kind == "int4":
            h = x.shape[1] // 2
            lo = (q[:, :h] + 8) & 0xF
            hi = q[:, h:] & 0xF
            rows = (lo | (hi << 4)).astype(jnp.int8)
        else:
            rows = q.astype(jnp.int8)
        if w_dev is not None:
            # residual-norm column, ceil-quantized (upper bound per row)
            r = jnp.sqrt(jnp.maximum(
                jnp.sum(block * block, axis=1)
                - jnp.sum(x * x, axis=1), 0.0))
            b = jnp.clip(jnp.ceil(r / rscale), 0, 127).astype(jnp.int8)
            rows = jnp.concatenate([rows, b[:, None]], axis=1)
        if kind == "int8":  # field contract: int8 kinds only
            l1 = jnp.maximum(l1, jnp.max(jnp.sum(jnp.abs(q), axis=1)))
        buf = jax.lax.dynamic_update_slice(buf, rows, (c0, jnp.int32(0)))
        return buf, l1

    state = (jnp.float32(0.0), jnp.float32(0.0))
    blocks_iter = lambda: _occupied_slot_chunks(mm, ranges, chunk)  # noqa: E731

    def _padded_block(block):
        if block.shape[0] < chunk:
            block = np.concatenate([
                block,
                np.zeros((chunk - block.shape[0], d), np.float32),
            ])
        return block

    import time as _time

    _p1_t0 = _time.monotonic()
    _p1_bytes = 0
    for ci, (c0, block) in enumerate(blocks_iter()):
        b = _padded_block(block)
        _uploaded[0] += b.nbytes
        _p1_bytes += b.nbytes
        state = pass1(state, jnp.asarray(b))
        # Bound in-flight uploads: each dispatched jnp.asarray allocates
        # its 1 GB device destination at enqueue, and the host loop runs
        # far ahead of the link — 57 unbounded chunk uploads at the 60M-
        # row ladder size filled the 16 GB HBM and surfaced as a
        # RESOURCE_EXHAUSTED in the FIRST SCAN after the build. A
        # 2-chunk window keeps upload/compute overlapped (the transform
        # is noise next to the link) while capping transients at ~2 GB.
        if ci % 2 == 1:
            jax.block_until_ready(state[0])
    amax = float(state[0])
    max_r = float(state[1])
    # Feed realized GB-scale upload throughput back into the placement
    # probe cache (the readback above fenced the stream, so the elapsed
    # time is a sound lower bound on the link rate).
    _record_realized_up_bps(_p1_bytes, _time.monotonic() - _p1_t0)
    scale = amax / (127.0 if kind == "int8" else 7.0)
    resid_scale = (
        max_r * _RESID_HEADROOM / 127.0 if rotation is not None else None
    )

    out_dim = (reduced_dim + 1) if rotation is not None else d
    if kind == "int4":
        out_dim = d // 2
    big_rows = n_chunks * chunk
    if scale == 0.0:
        buf = jnp.full((padded, out_dim), _fill_byte(kind), jnp.int8)
        return buf, 0.0, resid_scale, 0.0
    carry = (
        jnp.full((big_rows, out_dim), _fill_byte(kind), jnp.int8),
        jnp.int32(0),
    )
    for ci, (c0, block) in enumerate(blocks_iter()):
        b = _padded_block(block)
        _uploaded[0] += b.nbytes
        carry = pass2(carry, jnp.asarray(b), jnp.float32(scale),
                      jnp.float32(resid_scale or 1.0), jnp.int32(c0))
        # Same in-flight bound as pass 1 (block on the tiny l1 scalar,
        # not the donated buffer).
        if ci % 2 == 1:
            jax.block_until_ready(carry[1])
    buf, l1 = carry
    if big_rows != padded:
        buf = buf[:padded]
    # rows past the capacity are chunk padding, not corpus: their fill
    # encodings match the host build (zeros transform to the kind's
    # zero-vector encoding)
    buf.block_until_ready()
    return buf, scale, resid_scale, float(l1)


def _build(
    store, kind: str, reduced_dim: Optional[int], mesh=None, gen: int = 0
) -> Optional[SlotCorpus]:
    # ``gen`` was read BEFORE the layout/mmap: if a concurrent writer
    # lands in between, the entry is stamped with the OLDER generation
    # and the next query re-patches — stale data is never marked current.
    #
    # Memory contract: O(chunk + output). A 60M-row store's f32 image is
    # 61 GB; the full-buffer assembly this replaced (plus quantize_global
    # temporaries) peaked at ~3x that and OOM'd the capacity-ladder sizes
    # the quantized tiers exist for. The slot-space image is streamed in
    # 1M-row chunks: pass 1 fits rotation (sampled) + global scale, pass
    # 2 transforms each chunk straight into the padded output buffer.
    ranges = store._layout_with_rev()
    cap = store._capacity()
    if cap == 0 or not ranges:
        return None
    mm = store._mmap("r")
    if mm is None:
        return None

    rotation = None
    if reduced_dim:
        from semtools_tpu.ops.reduce import fit_rotation

        rotation = fit_rotation(
            _sample_occupied(mm, ranges, 1 << 17), reduced_dim
        )

    padded = _padded_rows(cap, mesh, kind)
    scale = None
    resid_scale = None
    dev_corpus = None
    max_l1 = 0.0
    if kind in ("int8", "int4") and _use_device_build(
        kind, cap, store.dim, mesh, reduced_dim
    ):
        try:
            dev_corpus, scale, resid_scale, max_l1 = _device_build_corpus(
                mm, ranges, cap, padded, kind, reduced_dim, rotation
            )
        except Exception:
            dev_corpus = None  # any device trouble: host path below
    if dev_corpus is None and kind in ("int8", "int4"):
        # Global amax over occupied rows (projected for the reduced
        # tier); zero slots never contribute. The same pass measures the
        # largest residual norm, which fixes the residual column's scale.
        amax = 0.0
        max_r = 0.0
        for c0, block in _occupied_slot_chunks(mm, ranges, _BUILD_CHUNK_ROWS):
            if rotation is not None:
                proj = block @ rotation
                r2 = np.maximum(
                    np.einsum("ij,ij->i", block, block)
                    - np.einsum("ij,ij->i", proj, proj), 0.0,
                )
                if r2.size:
                    max_r = max(max_r, float(np.sqrt(np.max(r2))))
                block = proj
            if block.size:
                amax = max(amax, float(np.max(np.abs(block))))
        scale = amax / (127.0 if kind == "int8" else 7.0)
        if rotation is not None:
            resid_scale = max_r * _RESID_HEADROOM / 127.0

    if dev_corpus is None:
        out_dim = store.dim
        if rotation is not None:
            out_dim = reduced_dim + 1  # +1: residual-norm column
        if kind == "int4":
            out_dim = store.dim // 2
        dtype = np.float32 if kind == "f32" else np.int8
        buf = np.full((padded, out_dim), _fill_byte(kind), dtype)
        for c0, block in _occupied_slot_chunks(mm, ranges, _BUILD_CHUNK_ROWS):
            if kind == "f32":
                buf[c0 : c0 + block.shape[0]] = block
            else:
                # _transform packs all-zero rows to the kind's zero-vector
                # encoding (0 / PACKED_ZERO_BYTE), matching the fill.
                q = _transform(block, kind, rotation, scale, resid_scale)
                buf[c0 : c0 + block.shape[0]] = q
                if kind == "int8" and q.size:
                    max_l1 = max(max_l1, float(
                        np.abs(q.astype(np.int32)).sum(axis=1).max()
                    ))
    del mm

    # Snapshot the hash sidecar at this generation (funds the row-level
    # patch diff; None when the store predates lines.h64).
    hashes = None
    hm = store._hash_mmap("r")
    if hm is not None:
        hashes = np.zeros(cap, np.uint64)
        for _, s, n, _rev in ranges:
            hashes[s : s + n] = hm[s : s + n]
        del hm
    sc = SlotCorpus(
        kind=kind,
        generation=gen,
        capacity=cap,
        corpus=dev_corpus if dev_corpus is not None else _device_put(buf, mesh),
        scale=scale,
        rotation=rotation,
        resid_scale=resid_scale,
        max_row_int_l1=max_l1,
        layout={p: (s, n, rev) for p, s, n, rev in ranges},
        mesh=mesh,
        hashes=hashes,
        model=_store_model(store),
        doc_versions=_doc_versions(store),
    )
    sc.refresh_lookup()
    return sc


def _store_model(store) -> Optional[str]:
    row = store.db.execute("SELECT value FROM meta WHERE key='model'").fetchone()
    return row[0] if row else None


def _doc_versions(store) -> Dict[str, int]:
    return {
        r[0]: (r[1] if r[1] is not None else 0)
        for r in store.db.execute("SELECT path, version FROM docs")
    }


def _patch(store, sc: SlotCorpus, gen: int) -> bool:
    """Bring ``sc`` up to generation ``gen`` (read before the layout; see
    _build) in place.

    Returns False when a patch is not worthwhile (over half the corpus
    changed, or the entry's int8 scale cannot represent new content) —
    the caller rebuilds instead.
    """
    # A zero quantization scale (all-zero corpus at build time) cannot
    # encode real rows; any content change must rebuild to refit it.
    if sc.kind in ("int8", "int4") and not sc.scale:
        return False
    # Provenance guard: a model swap (meta 'model' change, e.g. the
    # first-run hub download landing after the corpus was built with the
    # fallback embedder) re-embeds unchanged content into DIFFERENT
    # vectors with identical content hashes — nothing device-resident
    # can be trusted, hash-moves least of all. Rebuild.
    if _store_model(store) != sc.model:
        return False
    vers_now = _doc_versions(store)
    new_ranges = store._layout_with_rev()
    new_layout = {p: (s, n, rev) for p, s, n, rev in new_ranges}
    # Diff on (start, n, vec_rev): the allocator can hand a re-written
    # document the exact slot range it held before, so position equality
    # alone would serve stale device rows (round-2 review finding).
    changed = [
        (p, v[0], v[1])
        for p, v in new_layout.items()
        if sc.layout.get(p) != v
    ]
    removed = [
        (v[0], v[1]) for p, v in sc.layout.items() if new_layout.get(p) != v
    ]
    total = sum(v[1] for v in new_layout.values())
    if total == 0:
        return False
    # ROW-LEVEL DIFF PLAN. A changed document usually shares most of its
    # lines with its previous version (the line-reuse path upserts a
    # fresh block even for a 1-line edit). Match the new block's
    # lines.h64 hashes against the OLD block's hashes snapshotted on the
    # entry (sc.hashes — the mmap's own old block may already be freed
    # and re-used): rows whose hash survives MOVE device-side
    # (gather+scatter, zero host payload bytes); only novel rows upload.
    # A 1-line edit in a 500k-line file ships O(1 row), not O(file).
    # Matching is vectorized (sort + searchsorted): the plan itself must
    # stay far under the warm-query floor even at 500k-line documents.
    hm = store._hash_mmap("r") if changed else None
    plans = []  # (path, s_new, n_new, src, dst, novel_idx, h_new)
    novel_total = 0
    for p, s, n in changed:
        old = sc.layout.get(p)
        h_new = np.asarray(hm[s : s + n]) if hm is not None else None
        src = dst = novel = None
        # Hash equality identifies CONTENT; moves additionally require
        # the doc's embedding version to be unchanged since the snapshot
        # (a bumped version re-embeds identical lines into new vectors).
        prov_ok = (
            sc.doc_versions is not None
            and vers_now.get(p) == sc.doc_versions.get(p)
        )
        if prov_ok and sc.hashes is not None and h_new is not None and old is not None:
            s_old, n_old = old[0], old[1]
            h_old = sc.hashes[s_old : s_old + n_old]
            order = np.argsort(h_old, kind="stable")
            sorted_h = h_old[order]
            at = np.searchsorted(sorted_h, h_new)
            at_c = np.clip(at, 0, max(len(sorted_h) - 1, 0))
            found = (
                (len(sorted_h) > 0)
                & (sorted_h[at_c] == h_new)
                & (h_new != 0)
            )
            # The indexed path pays 8 B/row of index traffic + two extra
            # executables; only take it when it actually avoids most of
            # the row payload.
            if int(found.sum()) > max(32, n // 2):
                src = (s_old + order[at_c[found]]).astype(np.int32)
                dst = (s + np.nonzero(found)[0]).astype(np.int32)
                novel = np.nonzero(~found)[0]
        novel_total += n if novel is None else len(novel)
        plans.append((p, s, n, src, dst, novel, h_new))

    # Rebuild instead of patching when the patch would UPLOAD more than
    # half the live corpus anyway. Novel rows are the only host-volume
    # term: moves and zeroing are device-side, and a changed document's
    # freed old range is replacement bookkeeping, not upload.
    delta = sum(n for _, _, n in changed) + sum(n for _, n in removed)
    if novel_total > total // 2:
        return False

    # Drift refit heuristic: entries with a lossy transform (int8 global
    # scale and/or PCA rotation) encode NEW content under statistics fit
    # at build time. Bound the stale-transform fraction: once cumulative
    # novel + truly-deleted rows would exceed 25% of the live corpus,
    # rebuild instead — the rebuild refits rotation and scale on current
    # content. Moved rows don't age the transform (they keep the
    # byte-identical encoding a re-upload would produce), and a changed
    # document's freed old range is replacement bookkeeping, not a
    # distribution shift beyond what its novel rows already record.
    lossy = sc.scale is not None or sc.rotation is not None
    removed_gone = sum(
        v[1] for p, v in sc.layout.items() if p not in new_layout
    )
    aged = novel_total + removed_gone
    if lossy and sc.patched_rows + aged > total // 4:
        return False

    cap = store._capacity()
    padded = _padded_rows(cap, sc.mesh, sc.kind)
    arr = sc.corpus
    if padded > arr.shape[0]:
        arr = _grow_jit(
            padded, arr.shape[1], str(arr.dtype), sc.mesh, _fill_byte(sc.kind)
        )(arr)

    # Snapshot every moved row BEFORE any mutation: the zeroing below may
    # cover a moved row's old slot (its range was freed), and another
    # document's write may land there. Moves that form long contiguous
    # RUNS (a line edit preserves two huge runs around the edit) ship
    # via dynamic_slice/dynamic_update_slice with ZERO index upload;
    # fragmented diffs fall back to an indexed gather/scatter whose
    # index traffic is 8 B/row.
    import jax.numpy as jnp

    saved_scatter = []  # (saved rows [pow2, D'], padded dst indices)
    saved_slices = []  # (device block, dst_start, rows)
    cols, dt = arr.shape[1], str(arr.dtype)
    for _, _, _, src, dst, _, _ in plans:
        if src is None or not len(src):
            continue
        runs = _move_runs(src, dst)
        if len(src) >= 64 * len(runs):
            for s0, d0, length in runs:
                off = 0
                for c in _pow2_chunks(length):
                    blk = _slice_rows_jit(c, cols, dt, sc.mesh)(arr, s0 + off)
                    saved_slices.append((blk, d0 + off, c))
                    off += c
        else:
            src_p = _pad_pow2(src, 0)
            dst_p = _pad_pow2(dst, 0)
            _uploaded[0] += src_p.nbytes + dst_p.nbytes  # index traffic
            saved = _gather_rows_jit(len(src_p), cols, dt, sc.mesh)(
                arr, jnp.asarray(src_p)
            )
            saved_scatter.append((saved, dst_p))

    # Zero freed ranges next: the allocator may have handed part of a
    # freed range to a changed document, whose writes below must win.
    # (int4 "zero" rows are PACKED_ZERO_BYTE — see module docstring.)
    for s, n in removed:
        arr = _zero_rows(arr, s, n, sc.mesh, _fill_byte(sc.kind))

    for blk, d0, c in saved_slices:
        arr = _dus_jit(c, cols, dt, sc.mesh)(arr, blk, d0)
    for saved, dst_p in saved_scatter:
        arr = _scatter_rows_jit(len(dst_p), cols, dt, sc.mesh)(
            arr, jnp.asarray(dst_p), saved
        )

    # New-content bookkeeping for the serving bounds. A patched row whose
    # projection residual exceeds the residual column's representable
    # ceiling (127 * resid_scale, which _RESID_HEADROOM sized above the
    # build-time max) cannot carry a valid optimistic bound — bail to a
    # rebuild, which refits resid_scale (and the rotation) on current
    # content. int8 row L1 maxima stay monotone.
    new_max_l1 = sc.max_row_int_l1

    def _track_new(raw: np.ndarray, q_rows: np.ndarray) -> bool:
        """False when a new row overflows the residual column."""
        nonlocal new_max_l1
        if sc.rotation is not None and raw.size:
            proj = raw @ sc.rotation
            r = np.sqrt(np.maximum(
                np.einsum("ij,ij->i", raw, raw)
                - np.einsum("ij,ij->i", proj, proj), 0.0,
            ))
            if np.any(r > 127.0 * float(sc.resid_scale or 0.0)):
                return False
        if sc.kind == "int8" and q_rows.size:
            new_max_l1 = max(new_max_l1, float(
                np.abs(q_rows.astype(np.int32)).sum(axis=1).max()
            ))
        return True

    if changed:
        mm = store._mmap("r")
        if mm is None:
            return False
        for _, s, n, src, dst, novel, _ in plans:
            if src is None:
                raw = np.asarray(mm[s : s + n])
                rows = _transform(raw, sc.kind, sc.rotation, sc.scale,
                                  sc.resid_scale)
                if not _track_new(raw, rows):
                    return False  # caller discards and rebuilds
                arr = _write_rows(arr, rows, s, sc.mesh)
            elif len(novel):
                raw = np.asarray(mm[s + novel])
                rows = _transform(raw, sc.kind, sc.rotation, sc.scale,
                                  sc.resid_scale)
                if not _track_new(raw, rows):
                    return False
                arr = _scatter_upload(
                    arr, rows, (s + novel).astype(np.int32), sc.mesh
                )
        del mm

    sc.max_row_int_l1 = new_max_l1

    # Hash snapshot bookkeeping mirrors the corpus mutations.
    if sc.hashes is not None:
        if cap > len(sc.hashes):
            sc.hashes = np.concatenate(
                [sc.hashes, np.zeros(cap - len(sc.hashes), np.uint64)]
            )
        for s, n in removed:
            sc.hashes[s : s + n] = 0
        for _, s, n, _, _, _, h_new in plans:
            sc.hashes[s : s + n] = h_new if h_new is not None else 0

    sc.corpus = arr
    sc.capacity = cap
    sc.generation = gen
    sc.layout = new_layout
    if sc.doc_versions is not None:
        # changed docs were re-uploaded/moved under current provenance;
        # unchanged docs cannot have changed version without a rev bump
        sc.doc_versions = vers_now
    sc.patched_rows += aged if lossy else delta
    sc.refresh_lookup()
    return True


def is_warm(
    store, kind: str, reduced_dim: Optional[int] = None, mesh=None
) -> bool:
    """True when a device corpus for ``store`` is already resident (any
    generation — patching a stale entry ships only the changed rows).
    Never builds or uploads; the degraded-link serving policy uses this
    to tell 'one cheap patch away' from 'full corpus upload ahead'."""
    n_dev = int(mesh.devices.size) if mesh is not None else 0
    key = (str(store.dir), "slot", kind, reduced_dim or 0, n_dev)
    return isinstance(device_cache.peek(key), SlotCorpus)


# get() mutates the cached SlotCorpus IN PLACE when catching a stale entry
# up to the current generation (_patch donates the device buffer) — two
# threads patching the same entry would race on a donated/deleted array.
# The daemon's concurrent read path serializes get() per cache key; the
# scan itself (on the returned immutable jax array) stays concurrent.
# Keys are bounded by the device cache's own entry budget, so the lock
# table never grows meaningfully.
_get_locks_guard = threading.Lock()
_get_locks: Dict[tuple, threading.Lock] = {}


def _key_lock(key: tuple) -> threading.Lock:
    with _get_locks_guard:
        lk = _get_locks.get(key)
        if lk is None:
            lk = _get_locks[key] = threading.Lock()
        return lk


def get(
    store, kind: str, reduced_dim: Optional[int] = None, mesh=None
) -> Optional[SlotCorpus]:
    """Current-generation slot corpus for ``store`` — cache hit, in-place
    patch, or full rebuild, in that order of preference. With ``mesh``
    the corpus is row-sharded over it and patches apply to the sharded
    array in place (GSPMD partitions the dynamic_update_slice).
    Thread-safe: serialized per cache key (see _key_lock)."""
    n_dev = int(mesh.devices.size) if mesh is not None else 0
    key = (str(store.dir), "slot", kind, reduced_dim or 0, n_dev)
    with _key_lock(key):
        return _get_locked(store, kind, reduced_dim, mesh, key)


def _get_locked(
    store, kind: str, reduced_dim: Optional[int], mesh, key: tuple
) -> Optional[SlotCorpus]:
    gen = store.generation()
    cached = device_cache.peek(key)
    if isinstance(cached, SlotCorpus):
        if cached.generation == gen:
            return cached
        # A failure mid-patch (device OOM, interrupt) can leave the entry
        # pointing at a donated/deleted buffer — drop it and rebuild
        # rather than poisoning every later query on this store.
        try:
            patched = _patch(store, cached, gen)
        except Exception:
            device_cache.remove(key)
            patched = False
        if patched:
            device_cache.replace(key, cached)  # re-account bytes
            return cached
    fresh = _build(store, kind, reduced_dim, mesh, gen)
    if fresh is None:
        device_cache.remove(key)
        return None
    device_cache.replace(key, fresh)
    return fresh
