"""Daemon-side read coalescing: merge concurrent batched searches.

On a tunneled/degraded link, per-request device readback rides a kB/s
latency floor, so N parallel read-only searches cost ~N link round trips
while ONE batched scan of the same N queries costs ~one (measured 171x
at 8 readers on the tunneled daemon, RESULTS_TPU `daemon_parallel_reads`
— the motivating row). The daemon therefore funnels concurrent
:meth:`Store.search_line_embeddings_batched` calls that arrive within a
small window and address the SAME (store, path subset, top_k,
max_distance) into one underlying batched call on the leader's store,
then splits the per-query results back out.

Semantics: all merged queries are answered from one consistent scan
executed at some instant inside the window — exactly what each caller
would have observed had it arrived at that instant, so read-only callers
cannot distinguish coalesced from direct execution (the underlying impl
already owns snapshot consistency and its stale-epoch retry). Follower
errors fall back to direct execution on their own store, so a leader
failure never turns into a follower failure.

Disabled outside the daemon: only :func:`semtools_tpu.daemon.serve`
calls :func:`enable` (concurrent same-shape searches in one process are
otherwise already expressed through the batched API). Knobs:
``SEMTOOLS_TPU_COALESCE=0`` disables inside the daemon;
``SEMTOOLS_TPU_COALESCE_WINDOW_MS`` (default 8) sets the gather window —
small enough to be imperceptible per request, large enough to catch a
burst of parallel clients.

Reference context: the reference binary is one process per invocation
(no daemon), so its qdrant-edge store pays per-process model+index load
instead; this framework's daemon amortizes those and, with this module,
the per-request link cost too.
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional, Sequence

import numpy as np

_enabled = False
_lock = threading.Lock()
_open: dict = {}  # key -> _Batch

# test instrumentation: (merged_batches, merged_queries)
_stats = [0, 0]


def enable() -> None:
    """Turn the funnel on for this process (the daemon calls this)."""
    global _enabled
    _enabled = True


def enabled() -> bool:
    return _enabled and os.environ.get("SEMTOOLS_TPU_COALESCE", "1") != "0"


def _window_s() -> float:
    try:
        return float(
            os.environ.get("SEMTOOLS_TPU_COALESCE_WINDOW_MS", "8")
        ) / 1e3
    except ValueError:
        return 0.008


class _Batch:
    __slots__ = ("qs", "starts", "closed", "done", "results", "error")

    def __init__(self) -> None:
        self.qs: List[np.ndarray] = []
        self.starts: List[int] = []
        self.closed = False
        self.done = threading.Event()
        self.results = None
        self.error: Optional[BaseException] = None


def stats():
    return tuple(_stats)


def search_batched(
    store,
    query_vecs: np.ndarray,
    subset_paths: Sequence[str],
    top_k: int,
    max_distance: Optional[float],
    impl,
):
    """Coalescing wrapper around one store's batched-search ``impl``.

    ``impl(qs, paths, top_k, max_distance)`` is the non-coalescing
    entry (retry wrapper included); the leader runs it once for every
    merged query row.
    """
    qs = np.asarray(query_vecs, np.float32)
    # The path tuple itself is part of the key (not its hash): dict
    # lookup then falls back to full equality on a hash collision, so
    # two different subsets can never merge.
    key = (
        str(store.dir.resolve()),
        tuple(subset_paths),
        int(top_k),
        None if max_distance is None else float(max_distance),
    )
    with _lock:
        batch = _open.get(key)
        leader = batch is None or batch.closed
        if leader:
            batch = _Batch()
            _open[key] = batch
        start = sum(q.shape[0] for q in batch.qs)
        batch.starts.append(start)
        batch.qs.append(qs)

    if leader:
        # Gather window: followers join while the leader sleeps. The
        # window is host-side only — it delays the dispatch, it does not
        # lengthen the device work.
        import time

        time.sleep(_window_s())
        with _lock:
            batch.closed = True
            if _open.get(key) is batch:
                del _open[key]
        merged = (
            batch.qs[0] if len(batch.qs) == 1
            else np.concatenate(batch.qs, axis=0)
        )
        try:
            batch.results = impl(merged, subset_paths, top_k, max_distance)
            if len(batch.qs) > 1:
                _stats[0] += 1
                _stats[1] += merged.shape[0]
        except BaseException as e:  # noqa: BLE001 - replayed to leader
            batch.error = e
        finally:
            batch.done.set()
        if batch.error is not None:
            raise batch.error
        return batch.results[start : start + qs.shape[0]]

    # Follower: wait for the leader's scan. The timeout is generous (the
    # leader may be paying a cold build); on leader error or timeout the
    # follower falls back to a direct scan on its OWN store so one
    # failing request cannot fail its window-mates.
    if not batch.done.wait(timeout=3600.0) or batch.error is not None:
        return impl(qs, subset_paths, top_k, max_distance)
    return batch.results[start : start + qs.shape[0]]
