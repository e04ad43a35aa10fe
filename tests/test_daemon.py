"""Daemon mode: socket protocol, command execution, CLI forwarding."""

from __future__ import annotations

import threading
import time

import pytest

from semtools_tpu import daemon


@pytest.fixture()
def running_daemon(tmp_path, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON_DIR", str(tmp_path / "run"))
    monkeypatch.setenv("SEMTOOLS_TPU_PLATFORM", "cpu")
    monkeypatch.setenv("HOME", str(tmp_path))
    t = threading.Thread(target=daemon.serve, kwargs={"warm": False}, daemon=True)
    t.start()
    for _ in range(100):
        if daemon.ping():
            break
        time.sleep(0.05)
    else:
        pytest.fail("daemon did not start")
    yield
    daemon.stop()
    t.join(timeout=5)


def test_ping_roundtrip(running_daemon):
    assert daemon.ping()


def test_forward_search(running_daemon, tmp_path, capsys):
    f = tmp_path / "doc.txt"
    f.write_text("first line about cats\nsecond line about databases\n")
    code = daemon.forward(
        ["search", "databases", str(f), "--top-k", "1", "-n", "0"], None
    )
    assert code == 0
    out = capsys.readouterr().out
    assert "doc.txt" in out and "databases" in out


def test_forward_stdin_mode(running_daemon, capsys):
    code = daemon.forward(["search", "beta", "-n", "0"], "alpha\nbeta\n")
    assert code == 0
    out = capsys.readouterr().out
    assert "<stdin>" in out


def test_forward_error_paths(running_daemon, capsys):
    code = daemon.forward(["search", "q"], None)  # no input at all
    assert code == 1


def test_no_daemon_returns_none(tmp_path, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON_DIR", str(tmp_path / "empty"))
    assert daemon.forward(["search", "x"], None) is None
    assert not daemon.ping()


def test_should_forward_rules(tmp_path, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON_DIR", str(tmp_path / "none"))
    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON", "off")
    assert not daemon.should_forward(["search", "x"])
    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON", "always")
    assert daemon.should_forward(["search", "x"])
    assert not daemon.should_forward(["daemon", "status"])  # never self-forward
    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON", "auto")
    assert not daemon.should_forward(["search", "x"])  # no socket in auto


def test_stale_env_not_leaked(running_daemon, capsys):
    # the workspace env override must be scoped to one request
    code = daemon.forward(["workspace", "status"], None)
    # no active workspace in the daemon's env -> error exit path
    assert code in (0, 1)
