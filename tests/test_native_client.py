"""Native daemon client (cpp/semtools_client.cpp): protocol round-trip,
unicode escape decoding, exit-code passthrough, Python fallback.

The client exists for interactive latency — a compiled binary speaking
the daemon protocol directly (~8 ms warm round-trip measured) instead of
paying the Python interpreter + jax-plugin startup per CLI call, matching
the reference's compiled-binary startup class (src/bin/semtools.rs).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import threading
import time
from pathlib import Path

import pytest

from semtools_tpu import daemon

REPO = Path(__file__).resolve().parent.parent
CLIENT = REPO / "semtools_tpu" / "_native" / "semtools-client"
SRC = REPO / "cpp" / "semtools_client.cpp"


@pytest.fixture(scope="module")
def client() -> Path:
    if shutil.which("g++") is None and not CLIENT.exists():
        pytest.skip("no g++ and no prebuilt client")
    if not CLIENT.exists() or CLIENT.stat().st_mtime < SRC.stat().st_mtime:
        subprocess.run(["make", "-C", str(REPO / "cpp")], check=True, capture_output=True)
    return CLIENT


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON_DIR", str(tmp_path / "run"))
    monkeypatch.setenv("SEMTOOLS_TPU_PLATFORM", "cpu")
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setenv("SEMTOOLS_TPU_PYTHON", sys.executable)
    return {**os.environ}


@pytest.fixture()
def running_daemon(env):
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


def _run(client, env, args, stdin_text=None):
    return subprocess.run(
        [str(client), *args],
        input=stdin_text,
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )


class TestAgainstDaemon:
    def test_search_roundtrip(self, client, env, running_daemon, tmp_path):
        f = tmp_path / "doc.txt"
        f.write_text("first line about cats\nsecond line about databases\n")
        r = _run(client, env, ["search", "databases", str(f), "--top-k", "1", "-n", "0"],
                 stdin_text="")
        assert r.returncode == 0, r.stderr
        assert "doc.txt" in r.stdout and "databases" in r.stdout

    def test_stdin_mode(self, client, env, running_daemon):
        r = _run(client, env, ["search", "beta", "-n", "0"], stdin_text="alpha\nbeta\n")
        assert r.returncode == 0, r.stderr
        assert "<stdin>" in r.stdout

    def test_unicode_and_surrogate_escapes(self, client, env, running_daemon, tmp_path):
        """json.dumps emits non-ASCII as \\uXXXX (astral chars as surrogate
        pairs) — the client must decode them back to UTF-8 bytes."""
        f = tmp_path / "uni.txt"
        f.write_text("café résumé line\nemoji \U0001F600 line\nplain text line\n")
        r = _run(client, env, ["search", "plain", str(f), "--top-k", "3", "-n", "3"],
                 stdin_text="")
        assert r.returncode == 0, r.stderr
        assert "café" in r.stdout
        assert "\U0001F600" in r.stdout

    def test_non_utf8_argv_roundtrip(self, client, env, running_daemon, tmp_path):
        """A latin-1 filename (raw 0xE9 byte, not valid UTF-8) must reach
        the daemon as the same surrogateescape \\udcXX escapes the Python
        client would send — emitting the raw byte made the daemon's
        json.loads reject the whole request (review finding)."""
        name = os.fsdecode(b"caf\xe9.txt")  # lone surrogate in the str
        f = tmp_path / name
        f.write_text("alpha line\nbeta line\n")
        # bytes mode: stdout echoes the raw 0xE9 byte back (restored from
        # the daemon's \udce9 escape) — text-mode capture would choke
        r = subprocess.run(
            [str(client), "search", "beta", str(f), "--top-k", "1", "-n", "0"],
            input=b"", capture_output=True, env=env, timeout=120,
        )
        assert r.returncode == 0, r.stderr
        assert b"beta" in r.stdout
        assert b"caf\xe9.txt" in r.stdout

    def test_busy_daemon_falls_back_to_local_run(
        self, client, env, running_daemon, monkeypatch
    ):
        """With the daemon mid-command, the client must get the bounded
        busy reply and run locally — not queue behind the running
        command for the full socket timeout."""
        monkeypatch.setenv("SEMTOOLS_TPU_DAEMON_BUSY_WAIT_S", "0.05")
        # A writer holds the gate exclusively — even read-only commands
        # (search) must get the bounded busy reply while it's in flight.
        assert daemon._gate.acquire_writer(timeout=1)
        try:
            r = _run(client, env, ["search", "beta", "-n", "0"],
                     stdin_text="alpha\nbeta\n")
        finally:
            daemon._gate.release_writer()
        assert r.returncode == 0, r.stderr
        assert "<stdin>" in r.stdout

    def test_exit_code_passthrough(self, client, env, running_daemon):
        r = _run(client, env, ["search", "q"], stdin_text="")
        assert r.returncode == 1
        assert "Error" in r.stderr

    def test_json_flag(self, client, env, running_daemon, tmp_path):
        import json as _json

        f = tmp_path / "j.txt"
        f.write_text("alpha\nbeta\n")
        r = _run(client, env, ["search", "beta", str(f), "-j", "--top-k", "1"],
                 stdin_text="")
        assert r.returncode == 0, r.stderr
        data = _json.loads(r.stdout)
        assert data["results"]


class TestFallback:
    def test_no_daemon_runs_python(self, client, env, tmp_path):
        f = tmp_path / "doc.txt"
        f.write_text("x about cats\ny about databases\n")
        r = _run(client, env, ["search", "databases", str(f), "--top-k", "1", "-n", "0"],
                 stdin_text="")
        assert r.returncode == 0, r.stderr
        assert "databases" in r.stdout

    def test_no_daemon_refeeds_consumed_stdin(self, client, env):
        r = _run(client, env, ["search", "beta", "-n", "0"], stdin_text="alpha\nbeta\n")
        assert r.returncode == 0, r.stderr
        assert "<stdin>" in r.stdout

    def test_daemon_mgmt_always_python(self, client, env):
        r = _run(client, env, ["daemon", "status"], stdin_text="")
        assert "No daemon running" in r.stdout + r.stderr
