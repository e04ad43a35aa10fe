"""Multi-host initialization for the mesh layer.

The shard_map scans in :mod:`semtools_tpu.parallel.scan` are
topology-agnostic — a mesh spanning multiple hosts works unchanged, with
XLA routing the candidate all-gathers over ICI within a slice and DCN
across hosts. What a multi-host deployment needs beyond that is process
bootstrap, which this module wraps:

    from semtools_tpu.parallel import multihost
    multihost.initialize()        # no-op on single-host
    mesh = corpus_mesh()          # now spans every host's devices

``initialize`` reads the standard coordination env vars
(``JAX_COORDINATOR_ADDRESS``/``COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``
/``NUM_PROCESSES``, ``JAX_PROCESS_ID``/``PROCESS_ID``) or accepts them as
arguments, and is a no-op when none are present (single-host CLI use) or
when jax.distributed is already initialized. On TPU pods with standard
metadata, ``jax.distributed.initialize()`` auto-detects everything, so
calling with no env/args on such hosts also works.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def is_multihost_env() -> bool:
    return bool(
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bootstrap jax.distributed when configured; returns True if active.

    Safe to call unconditionally: single-host invocations (no coordinator
    configured) return False without touching jax.distributed.
    """
    global _initialized
    if _initialized:
        return True

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ) or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False

    def _env_int(*names):
        for n in names:
            v = os.environ.get(n)
            if v is not None:
                return int(v)
        return None

    if num_processes is None:
        num_processes = _env_int("JAX_NUM_PROCESSES", "NUM_PROCESSES")
    if process_id is None:
        process_id = _env_int("JAX_PROCESS_ID", "PROCESS_ID")

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True
