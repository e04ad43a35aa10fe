"""Device mesh construction and corpus sharding.

The reference is a single CPU process (SURVEY.md §5: no distributed backend
exists); the one first-class parallelism axis in this rebuild is **data
parallelism over chunk vectors**: the [N, D] corpus matrix is sharded along
N across a 1-D mesh, every device scans its shard, and per-device top-k
candidates are merged over ICI (see semtools_tpu.parallel.scan).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shards"


def corpus_mesh(n_devices: Optional[int] = None, axis: str = SHARD_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def bucket_rows(n: int, n_dev: int) -> int:
    """Padded row count for a mesh-sharded serving corpus.

    A multiple of the mesh size, rounded up in coarse steps (~n/16, min
    256/device) so small corpus mutations keep the padded SHAPE — the
    sharded scan executables key on shapes (n_true is traced), so a
    stable shape means no retrace on the first query after an upsert.
    Worst-case waste is ~6% zero rows, masked by n_true.
    """
    step = max(n_dev * 256, 1 << max(max(n, 1).bit_length() - 5, 0))
    step = ((step + n_dev - 1) // n_dev) * n_dev
    return ((n + step - 1) // step) * step


def shard_corpus(
    corpus, mesh: Mesh, axis: str = SHARD_AXIS
) -> Tuple[jax.Array, int]:
    """Place an [N, D] matrix row-sharded on the mesh.

    N is padded up to a bucketed multiple of the mesh size with zero rows
    (masked by the scans' traced n_true; bucketing keeps padded shapes —
    and therefore compiled executables — stable across nearby corpus
    sizes). Returns (sharded array, original N). Device-resident inputs
    (e.g. a freshly embedded corpus) pad and reshard on device — no host
    round-trip.
    """
    n, d = corpus.shape
    n_dev = mesh.devices.size
    pad = bucket_rows(n, int(n_dev)) - n
    sharding = NamedSharding(mesh, P(axis, None))
    if isinstance(corpus, jax.Array):
        import jax.numpy as jnp

        if pad:
            corpus = jnp.concatenate(
                [corpus, jnp.zeros((pad, d), corpus.dtype)], axis=0
            )
        return jax.device_put(corpus, sharding), n
    if pad:
        corpus = np.concatenate([corpus, np.zeros((pad, d), corpus.dtype)], axis=0)
    return jax.device_put(corpus, sharding), n
