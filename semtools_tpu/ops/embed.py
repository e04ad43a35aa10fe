"""TPU embedding kernel: token-row gather + segment mean + L2 normalize.

This is the TPU-native replacement for the reference's model2vec-rs CPU
encode path (``encode_with_args(lines, Some(2048), 16384)``,
src/search/mod.rs:69): per text, look up the embedding-table row of every
token, mean-pool, and optionally L2-normalize.

Design notes (TPU-first, not a port):

- Lines are ragged. Instead of padding each line to a common length (which
  wastes gather bandwidth on pad rows), all token ids are flattened into a
  single ``[T]`` vector with a parallel ``[T]`` segment-id vector, and the
  pooling is a sorted ``segment_sum`` — XLA lowers this to an efficient
  scatter-add on TPU since segment ids are monotonically non-decreasing.
- Shapes under ``jit`` must be static, so ``T`` (total tokens) and ``B``
  (number of texts) are padded up to power-of-two buckets; the jit cache
  holds one executable per (T-bucket, B-bucket) pair, bounding recompiles
  regardless of workload shape.
- Pad tokens carry weight 0 and are routed to a trash segment past the real
  ones, so they influence neither sums nor counts.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Upper bound on tokens processed per device call: bounds the [T, D] gather
# activation (2^21 tokens * 256 dims * 4 B = 2 GB) comfortably under HBM.
# Bigger calls matter on dispatch-latency hosts: 500k lines embed in ~8
# dispatches instead of ~31.
MAX_TOKENS_PER_CALL = 1 << 21
# Upper bound on texts per device call (4x the reference's encode batch
# size, src/search/mod.rs:69 — the token budget binds first for prose).
MAX_TEXTS_PER_CALL = 65536

_MIN_T_BUCKET = 256
_MIN_B_BUCKET = 8


def _next_pow2(n: int, floor: int) -> int:
    n = max(n, floor)
    return 1 << (n - 1).bit_length()


@functools.partial(jax.jit, static_argnames=("num_segments", "normalize"))
def _embed_segments(table, flat_ids, lengths, *, num_segments: int, normalize: bool):
    """Pooled embeddings for ``num_segments`` texts from flattened tokens.

    table:    [V, D] float          embedding rows
    flat_ids: [T]    int32          token ids (pad entries hold id 0)
    lengths:  [num_segments] int32  per-segment token counts; the last
                                    (trash) entry absorbs the pad tail, so
                                    the counts sum to T
    Returns [num_segments - 1, D] float32 (trash segment dropped).

    Segment ids and pad weights are RECONSTRUCTED ON DEVICE from the
    [num_segments] length vector instead of being shipped as two [T]
    arrays: the host->device payload per encode drops from 12 B/token to
    4 B/token (+4 B/text), which is the difference on transfer-limited
    hosts — the tunneled bench host uploads ~24 MB -> ~8 MB for a
    20k-line corpus (measured 2.3x e2e embed speedup).

    The reconstruction is a boundary scatter + cumsum — bandwidth-cheap
    next to the latency-bound row gather (within ~4% of shipping staged
    seg ids; ``jnp.repeat`` costs ~21% device throughput here, and a
    searchsorted costs 4.8x — measured on v5e).
    """
    starts = jnp.cumsum(lengths)[:-1]  # start offsets of segments 1..B
    # OOB starts (empty pad tail) drop; duplicate starts (empty segments
    # mid-batch) accumulate, and the cumsum jumps past them correctly.
    marks = jnp.zeros(flat_ids.shape[0], jnp.int32).at[starts].add(1, mode="drop")
    seg_ids = jnp.cumsum(marks)
    weights = (seg_ids < num_segments - 1).astype(jnp.float32)
    # ids may arrive as uint16 (vocab <= 65536 halves the upload); widen
    # on device, where the cast is free next to the gather.
    rows = jnp.take(table, flat_ids.astype(jnp.int32), axis=0).astype(jnp.float32)
    rows = rows * weights[:, None]
    # One scatter-add instead of two: the weights ride along as an extra
    # column so sums and counts come out of a single segment_sum pass.
    # The scatter is latency-bound on TPU (~18 ns/row regardless of
    # width), so folding the count pass in is a measured ~23% end-to-end
    # win (benchmarks/quantitative/bench_embed_variants.py).
    aug = jnp.concatenate([rows, weights[:, None]], axis=1)
    both = jax.ops.segment_sum(aug, seg_ids, num_segments=num_segments, indices_are_sorted=True)
    sums, counts = both[:, :-1], both[:, -1]
    mean = sums / jnp.maximum(counts, 1.0)[:, None]
    if normalize:
        norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
        mean = jnp.where(norm > 0.0, mean / jnp.maximum(norm, 1e-30), mean)
    return mean[:-1]


def _flatten_bucketed(
    token_lists: Sequence[Sequence[int]], max_length: int,
    id_dtype=np.int32,
):
    """Flatten ragged token lists into a bucket-padded flat-id vector plus
    the per-segment length vector the device program expands (see
    :func:`_embed_segments` — only flat ids cross host->device per token).

    Vectorized: one ``np.fromiter`` over the chained ids — a per-line
    Python slice-assignment loop costs ~8 s per 500k lines on this host's
    single core.
    """
    from itertools import chain

    b = len(token_lists)
    clipped = [ids[:max_length] for ids in token_lists]
    lengths = np.fromiter((len(ids) for ids in clipped), np.int64, count=b)
    t = int(lengths.sum())

    t_bucket = _next_pow2(t, _MIN_T_BUCKET)
    b_bucket = _next_pow2(b, _MIN_B_BUCKET)

    flat = np.zeros(t_bucket, dtype=id_dtype)
    flat[:t] = np.fromiter(chain.from_iterable(clipped), id_dtype, count=t)
    seg_lengths = np.zeros(b_bucket + 1, dtype=np.int32)
    seg_lengths[:b] = lengths
    seg_lengths[b_bucket] = t_bucket - t  # trash segment absorbs the pad tail
    return flat, seg_lengths, b_bucket


def embed_token_lists(
    table,
    token_lists: Sequence[Sequence[int]],
    *,
    max_length: int = 2048,
    normalize: bool = True,
    host: bool = False,
) -> "jnp.ndarray":
    """Embed ragged token-id lists → ``[len(token_lists), D]`` float32.

    Returns a DEVICE array by default (the scan consumes embeddings
    in-place; a host round-trip of the whole corpus would dominate on
    dispatch-latency-bound hosts). With ``host=True`` returns a NUMPY
    array instead, with each chunk's device→host copy started
    asynchronously as soon as that chunk's compute is dispatched — on
    transfer-limited hosts (the tunneled bench host moves ~10 MB/s
    device→host) this overlaps the corpus download with the Python-side
    flattening of later chunks instead of end-loading one giant blocking
    transfer.

    Splits work into device calls bounded by MAX_TOKENS_PER_CALL /
    MAX_TEXTS_PER_CALL so activation memory stays bounded for arbitrarily
    large files.
    """
    if len(token_lists) == 0:
        z = jnp.zeros((0, table.shape[1]), dtype=jnp.float32)
        return np.asarray(z) if host else z

    out: List[np.ndarray] = []
    chunk: List[Sequence[int]] = []
    chunk_tokens = 0
    # Measured dead end: shipping uint16 ids (vocab <= 65536) halves the
    # payload but runs ~1.7x SLOWER end-to-end on the tunneled backend —
    # the sub-word transfer is converted host-side. int32 everywhere.
    id_dtype = np.int32

    def flush():
        nonlocal chunk, chunk_tokens
        if not chunk:
            return
        flat, seg_lengths, b_bucket = _flatten_bucketed(chunk, max_length, id_dtype)
        res = _embed_segments(
            table,
            jnp.asarray(flat),
            jnp.asarray(seg_lengths),
            num_segments=b_bucket + 1,
            normalize=normalize,
        )
        res = res[: len(chunk)]
        if host:
            try:
                res.copy_to_host_async()
            except Exception:
                pass  # backend without async copies: np.asarray blocks below
        out.append(res)
        chunk = []
        chunk_tokens = 0

    for ids in token_lists:
        n = min(len(ids), max_length)
        if chunk and (chunk_tokens + n > MAX_TOKENS_PER_CALL or len(chunk) >= MAX_TEXTS_PER_CALL):
            flush()
        chunk.append(ids)
        chunk_tokens += n
    flush()

    if host:
        # Concatenate on host: chunks arrive via the async copies above;
        # a device-side concatenate would re-materialize the full corpus
        # in HBM and then re-download it in one end-loaded transfer.
        return np.asarray(out[0]) if len(out) == 1 else np.concatenate(
            [np.asarray(r) for r in out], axis=0
        )
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


def chunk_spans(
    token_lists: Sequence[Sequence[int]], max_length: int = 2048
) -> List[Tuple[int, int]]:
    """``[(start, end)]`` boundaries exactly as :func:`embed_token_lists`
    dispatches its device calls — the single source of truth for the
    chunk policy. The mid-flight gates (ops/host_embed.py) count chunks
    and time "the first chunk" through this, so a policy change here
    cannot silently desynchronize their switch decision."""
    spans: List[Tuple[int, int]] = []
    start = 0
    chunk_tokens = 0
    count = 0
    for i, ids in enumerate(token_lists):
        n = min(len(ids), max_length)
        if count and (
            chunk_tokens + n > MAX_TOKENS_PER_CALL or count >= MAX_TEXTS_PER_CALL
        ):
            spans.append((start, i))
            start, chunk_tokens, count = i, 0, 0
        chunk_tokens += n
        count += 1
    if count:
        spans.append((start, len(token_lists)))
    return spans


def warm_embed_call(
    table,
    token_lists: Sequence[Sequence[int]],
    *,
    max_length: int = 2048,
    normalize: bool = True,
) -> None:
    """Execute the exact jitted shape :func:`embed_token_lists` would
    dispatch for ONE chunk of ``token_lists`` — on device-created zeros,
    so nothing real crosses the link. Populates the jit-call cache (and
    the persistent compile cache) up front: the mid-flight gates time
    realized transfer+compute, and a cold-cache one-time XLA compile
    inside the timed call would be misattributed to link bandwidth and
    misroute a healthy-link build to the ~30x-slower host path."""
    lengths = [min(len(x), max_length) for x in token_lists]
    t_bucket = _next_pow2(sum(lengths), _MIN_T_BUCKET)
    b_bucket = _next_pow2(len(token_lists), _MIN_B_BUCKET)
    res = _embed_segments(
        table,
        jnp.zeros(t_bucket, jnp.int32),
        jnp.zeros(b_bucket + 1, jnp.int32),
        num_segments=b_bucket + 1,
        normalize=normalize,
    )
    # The real call also dispatches a shape-keyed res[:b] slice
    # (embed_token_lists' flush) — warm that executable too, or its
    # one-time compile lands inside the timed window. Still no
    # download: block_until_ready leaves the result on device.
    res = res[: len(token_lists)]
    try:
        res.block_until_ready()
    except Exception:
        pass


def embed_token_lists_reference(
    table: np.ndarray,
    token_lists: Sequence[Sequence[int]],
    *,
    max_length: int = 2048,
    normalize: bool = True,
) -> np.ndarray:
    """Pure-numpy reference implementation for correctness tests."""
    out = np.zeros((len(token_lists), table.shape[1]), dtype=np.float32)
    for i, ids in enumerate(token_lists):
        ids = list(ids)[:max_length]
        if not ids:
            continue
        vec = table[np.asarray(ids, dtype=np.int64)].astype(np.float32).mean(axis=0)
        if normalize:
            norm = np.linalg.norm(vec)
            if norm > 0:
                vec = vec / norm
        out[i] = vec
    return out
