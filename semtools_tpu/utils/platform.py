"""JAX platform pinning + persistent compile cache.

Shared by the CLI and the benchmark harnesses. ``SEMTOOLS_TPU_PLATFORM``
pins ``jax_platforms`` (setting only the ``JAX_PLATFORMS`` env var is not
enough on hosts whose TPU plugin prepends itself); the persistent compile
cache removes the per-process XLA compile latency a fresh CLI invocation
would otherwise pay (SURVEY.md §7 "cold-start latency").
"""

from __future__ import annotations

import os


def configure_jax() -> None:
    """Idempotent; call before the first jax computation in a process."""
    try:
        import jax

        platform = os.environ.get("SEMTOOLS_TPU_PLATFORM")
        if platform:
            jax.config.update("jax_platforms", platform)

        # Multi-host bootstrap: when coordination env vars are present
        # (JAX_COORDINATOR_ADDRESS et al.), join the jax.distributed
        # cluster so the serving mesh spans every host's devices; no-op on
        # single-host CLI use. Must run before the first backend query.
        from semtools_tpu.parallel import multihost

        multihost.initialize()
        if platform == "cpu":
            # CPU compiles are cheap, and XLA:CPU AOT cache reloads emit
            # noisy machine-feature warnings; cache only accelerator builds.
            return

        cache_dir = os.environ.get(
            "SEMTOOLS_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "semtools_tpu", "jax_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
