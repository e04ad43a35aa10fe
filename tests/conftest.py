"""Test configuration.

Must run before any ``import jax``: force the CPU backend with 8 virtual
devices so mesh-sharded code paths are testable without TPU hardware
(SURVEY.md §4's recommendation; the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Hermetic: never attempt a hub download, and acknowledge the fallback
# embedder (tests use it deliberately; the loud degradation warning is
# exercised explicitly in test_model.py).
os.environ.setdefault("SEMTOOLS_TPU_NO_FETCH", "1")
os.environ.setdefault("SEMTOOLS_TPU_ALLOW_FALLBACK", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# The env var alone is not enough on hosts whose TPU plugin prepends itself
# to jax_platforms; pin the platform list explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: XLA compiles (not compute) dominate this suite's
# runtime on the single-core CI host; caching makes reruns fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/semtools_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture(scope="session")
def fallback_model():
    """Session-wide deterministic embedder (mirrors the reference's shared
    OnceLock model in src/search/mod.rs:226-233, minus the network)."""
    from semtools_tpu.models.static_model import StaticModel

    return StaticModel.fallback()


@pytest.fixture()
def rng():
    return np.random.Generator(np.random.Philox(1234))
