"""ensure_backend: the wedged-accelerator-link watchdog (utils/platform.py).

The reference runs on local CPU and cannot hang this way; on this
framework's serving host the device is reached through a tunnel, and a
down tunnel blocks jax backend init FOREVER (observed outage). These
tests drive the watchdog's decision logic hermetically (monkeypatched
probe/exec) — tests/test_cli.py::test_wedged_backend_falls_back_to_cpu
covers the real re-exec end-to-end in a subprocess.
"""

import os
import threading

import pytest

from semtools_tpu.utils import platform as plat


class _ExecRecorded(Exception):
    pass


class _ExitRecorded(Exception):
    pass


@pytest.fixture()
def wedged(monkeypatch):
    """Probe never completes; execve/_exit record instead of acting."""
    calls = {}

    def hang():
        threading.Event().wait(60.0)

    def fake_execve(path, argv, env):
        calls["exec"] = (path, list(argv), dict(env))
        raise _ExecRecorded

    def fake_exit(code):
        calls["exit"] = code
        raise _ExitRecorded

    monkeypatch.setattr(plat, "_backend_probe", hang)
    monkeypatch.setattr(os, "execve", fake_execve)
    monkeypatch.setattr(os, "_exit", fake_exit)
    # test_daemon runs daemon.serve() in-process, which flips the
    # module-global via disallow_reexec() for the rest of the pytest
    # session — pin the default here so ordering can't leak in.
    monkeypatch.setattr(plat, "_REEXEC_ALLOWED", True)
    monkeypatch.setenv("SEMTOOLS_TPU_INIT_TIMEOUT", "0.2")
    monkeypatch.delenv("SEMTOOLS_TPU_INIT_FALLBACK", raising=False)
    monkeypatch.delenv("SEMTOOLS_TPU_PLATFORM", raising=False)
    return calls


def test_noop_when_cpu_pinned(monkeypatch):
    # cpu has no tunnel in the loop: no probe thread, no exec
    monkeypatch.setenv("SEMTOOLS_TPU_PLATFORM", "cpu")
    monkeypatch.setenv("SEMTOOLS_TPU_INIT_TIMEOUT", "0.01")

    def boom():
        raise AssertionError("probe must not run under a cpu pin")

    monkeypatch.setattr(plat, "_backend_probe", boom)
    plat.ensure_backend()


def test_noop_when_disabled(monkeypatch):
    monkeypatch.delenv("SEMTOOLS_TPU_PLATFORM", raising=False)
    monkeypatch.setenv("SEMTOOLS_TPU_INIT_TIMEOUT", "0")

    def boom():
        raise AssertionError("probe must not run when disabled")

    monkeypatch.setattr(plat, "_backend_probe", boom)
    plat.ensure_backend()


def test_fast_probe_no_exec(monkeypatch):
    monkeypatch.delenv("SEMTOOLS_TPU_PLATFORM", raising=False)
    monkeypatch.setenv("SEMTOOLS_TPU_INIT_TIMEOUT", "5")
    monkeypatch.setattr(plat, "_backend_probe", lambda: None)

    def boom(*a):
        raise AssertionError("must not exec when the probe completes")

    monkeypatch.setattr(os, "execve", boom)
    plat.ensure_backend()


def test_wedge_reexecs_pinned_to_cpu(wedged, capsys):
    with pytest.raises(_ExecRecorded):
        plat.ensure_backend()
    _, argv, env = wedged["exec"]
    assert env["SEMTOOLS_TPU_PLATFORM"] == "cpu"
    assert env["SEMTOOLS_TPU_INIT_FALLBACK"] == "1"
    assert "SEMTOOLS_TPU_REEXEC_STDIN" not in env
    assert "wedged" in capsys.readouterr().err


def test_wedge_hands_consumed_stdin_over(wedged):
    with pytest.raises(_ExecRecorded):
        plat.ensure_backend(stdin_text="piped content\n")
    _, _, env = wedged["exec"]
    tmp = env["SEMTOOLS_TPU_REEXEC_STDIN"]
    try:
        with open(tmp) as f:
            assert f.read() == "piped content\n"
    finally:
        os.unlink(tmp)


def test_wedge_in_daemon_raises_instead_of_exec(wedged, monkeypatch):
    # A resident daemon must never execve itself away mid-request: the
    # wedge surfaces as an exception -> the command's error reply.
    monkeypatch.setattr(plat, "_REEXEC_ALLOWED", False)
    with pytest.raises(plat.BackendWedgedError, match="wedged"):
        plat.ensure_backend()
    assert "exec" not in wedged and "exit" not in wedged


def test_second_wedge_exits_instead_of_looping(wedged, monkeypatch, capsys):
    monkeypatch.setenv("SEMTOOLS_TPU_INIT_FALLBACK", "1")
    with pytest.raises(_ExitRecorded):
        plat.ensure_backend()
    assert wedged["exit"] == 2
    assert "exec" not in wedged
    assert "giving up" in capsys.readouterr().err
