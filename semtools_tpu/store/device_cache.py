"""Device-resident corpus cache for workspace scans.

A one-shot CLI process must upload the corpus matrix host->device every
query; inside the daemon (semtools_tpu.daemon) that upload is the whole
cost of a warm search. This cache keeps recently-scanned corpora resident
on device, keyed by (store path, generation) — any vector mutation bumps
the generation, so stale entries can never be served.

Bounded by bytes (default 4 GiB, SEMTOOLS_TPU_DEVICE_CACHE_BYTES), LRU
eviction. Entries are plain jax Arrays; on CPU backends this is just an
in-process host cache, which still skips the mmap gather + conversion.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import Callable, Hashable, Tuple

_lock = threading.Lock()
_entries: "OrderedDict[Hashable, Tuple[object, int]]" = OrderedDict()
_total_bytes = 0


def _max_bytes() -> int:
    try:
        return int(os.environ.get("SEMTOOLS_TPU_DEVICE_CACHE_BYTES", 4 << 30))
    except ValueError:
        return 4 << 30


def _nbytes(value) -> int:
    """Bytes held by an array or a (possibly nested) tuple/list of arrays."""
    if isinstance(value, (tuple, list)):
        return sum(_nbytes(v) for v in value)
    if hasattr(value, "device_nbytes"):  # e.g. patch_cache.SlotCorpus
        return int(value.device_nbytes)
    try:
        return int(value.size) * value.dtype.itemsize
    except Exception:
        return 0


def peek(key: Hashable):
    """Cached value for ``key`` (refreshing LRU order), or None."""
    with _lock:
        if key in _entries:
            _entries.move_to_end(key)
            return _entries[key][0]
    return None


def replace(key: Hashable, value) -> None:
    """Insert or overwrite ``key`` (re-accounting its byte size)."""
    global _total_bytes
    size = _nbytes(value)
    with _lock:
        if key in _entries:
            _total_bytes -= _entries.pop(key)[1]
        _entries[key] = (value, size)
        _total_bytes += size
        while _total_bytes > _max_bytes() and len(_entries) > 1:
            _, (old, old_size) = _entries.popitem(last=False)
            _total_bytes -= old_size
            del old


def remove(key: Hashable) -> None:
    global _total_bytes
    with _lock:
        if key in _entries:
            _total_bytes -= _entries.pop(key)[1]


def get_or_put(key: Hashable, builder: Callable[[], object]):
    """Return the cached array for ``key``, building and caching on miss."""
    global _total_bytes
    with _lock:
        if key in _entries:
            _entries.move_to_end(key)
            return _entries[key][0]
    value = builder()
    size = _nbytes(value)
    if size > _max_bytes():
        return value  # too big to cache; hand it back uncached
    with _lock:
        if key not in _entries:
            _entries[key] = (value, size)
            _total_bytes += size
            while _total_bytes > _max_bytes() and len(_entries) > 1:
                _, (old, old_size) = _entries.popitem(last=False)
                _total_bytes -= old_size
                del old
        _entries.move_to_end(key)
        return _entries[key][0]


def invalidate(prefix: Hashable = None) -> None:
    """Drop all entries (or those whose key[0] == prefix)."""
    global _total_bytes
    with _lock:
        if prefix is None:
            _entries.clear()
            _total_bytes = 0
            return
        for k in [k for k in _entries if isinstance(k, tuple) and k and k[0] == prefix]:
            _, size = _entries.pop(k)
            _total_bytes -= size


def stats() -> Tuple[int, int]:
    with _lock:
        return len(_entries), _total_bytes
