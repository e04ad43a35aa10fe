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


def shard_corpus(
    corpus: np.ndarray, mesh: Mesh, axis: str = SHARD_AXIS
) -> Tuple[jax.Array, int]:
    """Place an [N, D] matrix row-sharded on the mesh.

    N is padded up to a multiple of the mesh size with zero rows (zero rows
    score distance 1.0 and never displace real candidates unless the corpus
    is smaller than k; callers mask by true N). Returns (sharded array,
    original N).
    """
    n, d = corpus.shape
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    if pad:
        corpus = np.concatenate([corpus, np.zeros((pad, d), corpus.dtype)], axis=0)
    sharding = NamedSharding(mesh, P(axis, None))
    return jax.device_put(corpus, sharding), n
