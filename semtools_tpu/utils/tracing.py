"""Per-stage timing + device-level profiler hooks.

The reference has no tracing at all (SURVEY.md §5); for a
throughput-oriented TPU build, knowing where wall time goes is part of
the product. Two independent switches:

- ``SEMTOOLS_TPU_TIMINGS=1`` — every :func:`stage` block records wall
  time; a summary table prints to stderr when the process exits (or when
  :func:`report` is called). Zero overhead when unset beyond one dict
  lookup per stage.
- ``SEMTOOLS_TPU_TRACE=<dir>`` — wraps the command in
  ``jax.profiler.trace(dir)``, producing a TensorBoard-loadable device
  trace (XLA op timeline, HBM usage) for kernel-level work.

Usage::

    from semtools_tpu.utils.tracing import stage

    with stage("embed"):
        ...
"""

from __future__ import annotations

import atexit
import contextlib
import os
import sys
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple

_totals: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)
_registered = False


def enabled() -> bool:
    return bool(os.environ.get("SEMTOOLS_TPU_TIMINGS"))


@contextlib.contextmanager
def stage(name: str) -> Iterator[None]:
    """Time a pipeline stage (no-op unless SEMTOOLS_TPU_TIMINGS is set)."""
    if not enabled():
        yield
        return
    global _registered
    if not _registered:
        _registered = True
        atexit.register(report)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _totals[name] += time.perf_counter() - t0
        _counts[name] += 1


def timings() -> List[Tuple[str, float, int]]:
    """(stage, total_seconds, calls), slowest first."""
    return sorted(
        ((k, v, _counts[k]) for k, v in _totals.items()),
        key=lambda t: -t[1],
    )


def report(file=None) -> None:
    rows = timings()
    if not rows:
        return
    out = file or sys.stderr
    width = max(len(r[0]) for r in rows)
    print("-- semtools timings --", file=out)
    for name, total, count in rows:
        print(f"  {name:<{width}}  {total * 1e3:9.1f} ms  x{count}", file=out)


def reset() -> None:
    _totals.clear()
    _counts.clear()


@contextlib.contextmanager
def maybe_device_trace() -> Iterator[None]:
    """jax.profiler.trace(...) when SEMTOOLS_TPU_TRACE names a directory."""
    trace_dir = os.environ.get("SEMTOOLS_TPU_TRACE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    print(f"semtools: device trace written to {trace_dir}", file=sys.stderr)
