"""JAX platform pinning + persistent compile cache.

Shared by the CLI and the benchmark harnesses. ``SEMTOOLS_TPU_PLATFORM``
pins ``jax_platforms`` (setting only the ``JAX_PLATFORMS`` env var is not
enough on hosts whose TPU plugin prepends itself); the persistent compile
cache removes the per-process XLA compile latency a fresh CLI invocation
would otherwise pay (SURVEY.md §7 "cold-start latency").
"""

from __future__ import annotations

import os


def _backend_probe() -> None:
    """First backend use — the call that blocks when the accelerator
    link is wedged. Separated out so tests can substitute a hang."""
    if os.environ.get("SEMTOOLS_TPU_TEST_WEDGE_INIT") == "1":
        # Test hook: simulate the wedged tunnel (tests/test_cli.py drives
        # the CPU-fallback re-exec end-to-end through a real subprocess).
        import time

        while True:
            time.sleep(3600)
    import jax

    jax.devices()


# A resident daemon serves client commands IN-PROCESS (daemon._run_command
# -> cli.main); a wedge there must surface as that command's error reply,
# never as an execve of the whole daemon into a re-run of its own argv.
_REEXEC_ALLOWED = True


class BackendWedgedError(RuntimeError):
    """Backend init exceeded the watchdog in a process that must not
    re-exec (resident daemon). Distinct type so callers with blanket
    jax-error fallbacks (store._n_devices) can let it propagate."""


def disallow_reexec() -> None:
    """Mark this process as not safely re-executable (resident daemon):
    a tripped init watchdog raises instead of execve'ing."""
    global _REEXEC_ALLOWED
    _REEXEC_ALLOWED = False


def ensure_backend(stdin_text: "str | None" = None) -> None:
    """Force jax backend bring-up under a watchdog; degrade to CPU if wedged.

    On this class of host the accelerator is reached through a tunnel
    relay, and when the tunnel is down, backend init blocks FOREVER — a
    plain ``semtools search`` hangs with no diagnostics (observed outage,
    ROUND_NOTES; same failure mode bench.py's watchdog covers). This runs
    the first backend query on a probe thread; if it hasn't completed
    within ``SEMTOOLS_TPU_INIT_TIMEOUT`` seconds (default 120, 0 disables)
    the process re-execs itself pinned to the CPU backend with a loud
    stderr warning — every serving tier is exact on CPU, so results are
    identical, just slower. A second wedge (CPU cannot hang; guarded by
    ``SEMTOOLS_TPU_INIT_FALLBACK``) exits 2 instead of looping.

    Call only on device-bound paths. The re-exec restarts the command
    from scratch; if the caller already consumed stdin (the CLI's
    daemon-fallthrough path), pass it as ``stdin_text`` — it is handed to
    the re-exec'd process through a temp file named in
    ``SEMTOOLS_TPU_REEXEC_STDIN``, which the CLI restores at startup.

    In a process marked with :func:`disallow_reexec` (the resident
    daemon serving a client command in-process) a tripped watchdog
    raises ``RuntimeError`` instead — the command gets an error reply
    and the daemon survives.
    """
    configure_jax()  # idempotent: pin platform/compile cache before init
    try:
        timeout = float(os.environ.get("SEMTOOLS_TPU_INIT_TIMEOUT", "120"))
    except ValueError:
        timeout = 120.0
    if timeout <= 0:
        return
    if os.environ.get("SEMTOOLS_TPU_PLATFORM") == "cpu":
        return  # no tunnel in the loop; init cannot wedge

    import sys
    import threading

    done = threading.Event()

    def _run() -> None:
        try:
            _backend_probe()
        except Exception:
            pass  # an init ERROR surfaces naturally on the next jax call
        finally:
            done.set()

    threading.Thread(target=_run, daemon=True, name="backend-probe").start()
    if done.wait(timeout):
        return

    if not _REEXEC_ALLOWED:
        raise BackendWedgedError(
            f"accelerator backend init exceeded {timeout:.0f}s — the device "
            "link looks wedged. This resident process cannot restart itself; "
            "restart the daemon with SEMTOOLS_TPU_PLATFORM=cpu to serve on "
            "the CPU backend."
        )

    if os.environ.get("SEMTOOLS_TPU_INIT_FALLBACK") == "1":
        print(
            f"Error: accelerator backend init exceeded {timeout:.0f}s again "
            "after the CPU fallback re-exec; giving up.",
            file=sys.stderr, flush=True,
        )
        os._exit(2)

    print(
        f"WARNING: accelerator backend init exceeded {timeout:.0f}s — the "
        "device link looks wedged. Falling back to the CPU backend (results "
        "are identical; throughput is reduced). Pin SEMTOOLS_TPU_PLATFORM="
        "cpu to skip the wait, or raise SEMTOOLS_TPU_INIT_TIMEOUT.",
        file=sys.stderr, flush=True,
    )
    env = dict(os.environ)
    env["SEMTOOLS_TPU_PLATFORM"] = "cpu"
    env["SEMTOOLS_TPU_INIT_FALLBACK"] = "1"
    if stdin_text is not None:
        import tempfile

        fd, tmp = tempfile.mkstemp(prefix="semtools_stdin_")
        with os.fdopen(fd, "w") as f:
            f.write(stdin_text)
        env["SEMTOOLS_TPU_REEXEC_STDIN"] = tmp
    # `python -m pkg.mod` runs must re-exec the same way: exec'ing
    # sys.argv[0] (the module FILE) directly would drop the original
    # sys.path entry that made the package importable.
    import __main__

    spec = getattr(__main__, "__spec__", None)
    if spec is not None and getattr(spec, "name", None):
        cmd = [sys.executable, "-m", spec.name] + sys.argv[1:]
    else:
        cmd = [sys.executable] + sys.argv
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(cmd[0], cmd, env)


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
