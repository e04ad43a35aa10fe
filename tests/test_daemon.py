"""Daemon mode: socket protocol, command execution, CLI forwarding."""

from __future__ import annotations

import threading
import time

import pytest

from semtools_tpu import daemon

pytestmark = pytest.mark.skipif(
    not daemon.supported(), reason="daemon requires unix sockets"
)


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


def test_socket_permissions(running_daemon):
    import os
    import stat

    path = daemon.socket_path()
    st_dir = os.stat(path.parent)
    st_sock = os.stat(path)
    assert stat.S_IMODE(st_dir.st_mode) == 0o700
    assert stat.S_IMODE(st_sock.st_mode) == 0o600


def test_env_forwarding_allowlist():
    assert daemon._env_key_forwardable("SEMTOOLS_WORKSPACE")
    assert daemon._env_key_forwardable("SEMTOOLS_TPU_STORE_INT8")
    assert daemon._env_key_forwardable("SEMTOOLS_TPU_MODEL_DIR")
    assert daemon._env_key_forwardable("OPENAI_API_KEY")
    assert daemon._env_key_forwardable("HOME")
    # daemon control knobs must never be client-overridable (recursion)
    assert not daemon._env_key_forwardable("SEMTOOLS_TPU_DAEMON")
    assert not daemon._env_key_forwardable("SEMTOOLS_TPU_DAEMON_DIR")
    # arbitrary env is rejected server-side
    assert not daemon._env_key_forwardable("LD_PRELOAD")
    assert not daemon._env_key_forwardable("PATH")


def test_semtools_env_scoped_per_request(monkeypatch):
    # A SEMTOOLS_* var present in the daemon's stale environment but absent
    # from the request must be unset while the command runs; one the client
    # sends must be visible. Both restored afterwards.
    import os

    import semtools_tpu.cli as cli

    monkeypatch.setenv("SEMTOOLS_TPU_STORE_INT8", "1")  # stale daemon state
    seen = {}

    def fake_main(argv):
        seen["int8"] = os.environ.get("SEMTOOLS_TPU_STORE_INT8")
        seen["model"] = os.environ.get("SEMTOOLS_TPU_MODEL")
        return 0

    monkeypatch.setattr(cli, "main", fake_main)
    resp = daemon._run_command(
        {"argv": ["workspace", "status"], "env": {"SEMTOOLS_TPU_MODEL": "m1",
                                                  "LD_PRELOAD": "/evil.so"}}
    )
    assert resp["exit"] == 0
    assert seen["int8"] is None          # stale var scoped out
    assert seen["model"] == "m1"         # client var forwarded
    assert os.environ["SEMTOOLS_TPU_STORE_INT8"] == "1"  # restored
    assert "SEMTOOLS_TPU_MODEL" not in os.environ
    assert "LD_PRELOAD" not in os.environ  # rejected by allowlist


def test_concurrent_clients(running_daemon, tmp_path):
    # Commands run one at a time under the daemon's lock; concurrent
    # clients must all get complete, uncorrupted replies.
    import json

    results = [None] * 6

    def one(i):
        resp = daemon._request({
            "argv": ["--version"], "stdin": None,
            "cwd": str(tmp_path), "env": {},
        })
        results[i] = resp

    threads = [threading.Thread(target=one, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    for resp in results:
        assert resp is not None and resp["exit"] == 0
        assert "semtools" in resp["stdout"]
        json.dumps(resp)  # reply was valid JSON end-to-end


def test_forward_queries_file_batch(running_daemon, tmp_path, capsys):
    f = tmp_path / "doc.txt"
    f.write_text("first line about cats\nsecond line about databases\n")
    qf = tmp_path / "q.txt"
    qf.write_text("databases\ncats\n")
    code = daemon.forward(
        ["search", "-Q", str(qf), str(f), "--top-k", "1", "-n", "0"], None
    )
    assert code == 0
    out = capsys.readouterr().out
    assert "# query: databases" in out and "# query: cats" in out


def test_forward_queries_from_stdin_dash(running_daemon, tmp_path, capsys):
    """-Q -: the query list rides the forwarded stdin_text through the
    socket; the daemon replays it as the in-process sys.stdin."""
    f = tmp_path / "doc.txt"
    f.write_text("first line about cats\nsecond line about databases\n")
    code = daemon.forward(
        ["search", "-Q", "-", str(f), "--top-k", "1", "-n", "0"],
        "databases\n",
    )
    assert code == 0
    out = capsys.readouterr().out
    assert "# query: databases" in out and "databases" in out


def test_busy_daemon_answers_instead_of_queueing(monkeypatch):
    """While one command runs under the serialization lock, a second
    forwarded command gets {"busy": true} after the bounded busy wait —
    it must NOT queue for the full 4 h socket timeout (review finding:
    a trivial `workspace status` queued behind a 35-minute index
    build)."""
    from semtools_tpu import daemon

    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON_BUSY_WAIT_S", "0.05")
    assert daemon._gate.acquire_writer(timeout=1)
    try:
        resp = daemon._run_command({"argv": ["--version"]})
        # a READ-ONLY command queues behind a writer the same bounded way
        resp_r = daemon._run_command({"argv": ["search", "q"]})
    finally:
        daemon._gate.release_writer()
    assert resp == {"busy": True}
    assert resp_r == {"busy": True}
    # and with the lock free the same request executes normally
    resp = daemon._run_command({"argv": ["--version"]})
    assert resp.get("exit") == 0


def test_forward_runs_locally_on_busy(monkeypatch):
    """The client treats a busy reply as 'run locally' — the daemon
    never started the command, so nothing is duplicated."""
    from semtools_tpu import daemon

    monkeypatch.setattr(daemon, "_request", lambda obj, timeout=0: {"busy": True})
    assert daemon.forward(["workspace", "status"], None) is None


def test_forward_timeout_uniformly_long():
    # Any forwarded command can legitimately run for a long time (cold
    # search over a huge corpus, index build, parse poll); a short cap
    # made the client abandon the socket and duplicate the SAME work
    # locally while the daemon kept running it under the store flock.
    from semtools_tpu.daemon import _forward_timeout

    for argv in (
        ["search", "q", "f.txt"],
        ["workspace", "status"],
        ["workspace", "index", "--force"],
        ["parse", "a.pdf"],
        [],
    ):
        assert _forward_timeout(argv) == 4 * 3600.0


# ---------------------------------------------------------------------------
# Hostile/malformed requests: any local process can open the socket


def _raw_request(payload: bytes) -> bytes:
    import socket as _socket

    with _socket.socket(_socket.AF_UNIX, _socket.SOCK_STREAM) as s:
        s.settimeout(10.0)
        s.connect(str(daemon.socket_path()))
        s.sendall(payload)
        s.shutdown(_socket.SHUT_WR)
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(1 << 20)
            if not chunk:
                break
            buf += chunk
        return buf


def test_non_dict_json_gets_clean_reply(running_daemon):
    import json

    for payload in (b"[1, 2, 3]\n", b'"ping"\n', b"42\n"):
        resp = json.loads(_raw_request(payload))
        assert resp["exit"] == 2
        assert "bad request" in resp["stderr"]


def test_invalid_utf8_gets_clean_reply(running_daemon):
    import json

    resp = json.loads(_raw_request(b'{"op": "\xff\xfe"}\n'))
    assert resp["exit"] == 2


def test_malformed_shapes_get_clean_reply(running_daemon):
    import json

    bad = [
        {"argv": "search q"},              # argv not a list
        {"argv": [1, 2]},                  # argv items not str
        {"argv": ["-V"], "env": ["x"]},    # env not a dict (empty [] is
                                           # falsy and normalizes to {})
        {"argv": ["-V"], "env": {"SEMTOOLS_X": 7}},  # env value not str
        {"argv": ["-V"], "cwd": 5},        # cwd not a str
        {"argv": ["-V"], "stdin": 9},      # stdin not a str
    ]
    for req in bad:
        resp = json.loads(_raw_request(json.dumps(req).encode() + b"\n"))
        assert resp.get("exit") == 2, req
        # daemon still alive and serving
    assert daemon.ping()


def test_oversized_request_tells_client_to_run_locally(running_daemon, monkeypatch):
    import json

    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON_MAX_REQUEST", "4096")
    resp = json.loads(_raw_request(b'{"argv": ["' + b"x" * 8192 + b'"]}\n'))
    assert resp.get("too_large") is True
    assert "exit" not in resp  # the no-exit shape both clients treat as fallback
    assert daemon.ping()


def test_forward_skips_giant_stdin(running_daemon, monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON_MAX_REQUEST", "1024")
    rc = daemon.forward(["search", "q"], stdin_text="y" * 4096)
    assert rc is None  # caller runs the command locally


def test_exact_cap_request_is_accepted(running_daemon, monkeypatch):
    """The advertised cap covers the PAYLOAD; the trailing newline must
    not push an exactly-cap-sized request into the too_large path."""
    import json

    req = {"op": "ping"}
    body = json.dumps(req).encode()
    cap = len(body)  # payload exactly at the cap
    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON_MAX_REQUEST", str(cap))
    resp = json.loads(_raw_request(body + b"\n"))
    assert resp.get("ok") is True
    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON_MAX_REQUEST", str(cap - 1))
    resp = json.loads(_raw_request(body + b"\n"))
    assert resp.get("too_large") is True


# ---------------------------------------------------------------------------
# Concurrent read path: queries share the gate, mutations stay exclusive


def test_read_only_classification():
    assert daemon._read_only(["search", "q", "f.txt"])
    assert daemon._read_only(["search", "-Q", "qs.txt", "f.txt"])
    assert daemon._read_only(["workspace", "status"])
    assert daemon._read_only(["workspace", "status", "-j"])
    for argv in (
        ["workspace", "index"],
        ["workspace", "use", "w"],
        ["workspace", "compact"],
        ["workspace", "prune"],
        ["parse", "a.pdf"],
        ["ask", "question"],
        ["--version"],
        [],
    ):
        assert not daemon._read_only(argv)


def test_gate_readers_share_same_ctx(tmp_path):
    gate = daemon._Gate()
    assert gate.acquire_reader(str(tmp_path), {}, timeout=1)
    try:
        # identical ctx joins without waiting for the first to release
        assert gate.acquire_reader(str(tmp_path), {}, timeout=0.05)
        gate.release_reader()
    finally:
        gate.release_reader()


def test_gate_different_ctx_and_writers_exclude(tmp_path):
    gate = daemon._Gate()
    other = tmp_path / "other"
    other.mkdir()
    assert gate.acquire_reader(str(tmp_path), {}, timeout=1)
    try:
        # different cwd -> bounded wait, then busy
        assert not gate.acquire_reader(str(other), {}, timeout=0.05)
        # different env overrides -> busy too
        assert not gate.acquire_reader(str(tmp_path), {"SEMTOOLS_X": "1"}, timeout=0.05)
        # writers wait for readers to drain
        assert not gate.acquire_writer(timeout=0.05)
    finally:
        gate.release_reader()
    assert gate.acquire_writer(timeout=1)
    try:
        assert not gate.acquire_reader(str(tmp_path), {}, timeout=0.05)
    finally:
        gate.release_writer()
    assert gate.acquire_reader(str(tmp_path), {}, timeout=1)
    gate.release_reader()


def test_gate_installs_ctx_first_in_restores_last_out(tmp_path, monkeypatch):
    import os

    gate = daemon._Gate()
    monkeypatch.setenv("SEMTOOLS_GATE_PROBE", "daemon-value")
    start_cwd = os.getcwd()
    assert gate.acquire_reader(str(tmp_path), {"SEMTOOLS_GATE_PROBE": "client"}, timeout=1)
    assert os.getcwd() == str(tmp_path)
    assert os.environ["SEMTOOLS_GATE_PROBE"] == "client"
    # second reader, same ctx: no reinstall needed, state already right
    assert gate.acquire_reader(str(tmp_path), {"SEMTOOLS_GATE_PROBE": "client"}, timeout=1)
    gate.release_reader()
    # still installed: one reader remains
    assert os.environ["SEMTOOLS_GATE_PROBE"] == "client"
    gate.release_reader()
    # last reader out restores the daemon's own cwd/env
    assert os.getcwd() == start_cwd
    assert os.environ["SEMTOOLS_GATE_PROBE"] == "daemon-value"


def test_concurrent_searches_truly_overlap(running_daemon, tmp_path, monkeypatch):
    """Two forwarded searches must be INSIDE command execution at the same
    instant — a barrier inside a stubbed cli main proves overlap
    deterministically (the old single lock would deadlock this test)."""
    import semtools_tpu.cli as cli

    barrier = threading.Barrier(2, timeout=10)
    real_main = cli.main

    def barrier_main(argv):
        if argv and argv[0] == "search":
            barrier.wait()  # both threads must arrive -> true overlap
            print(f"served {argv[1]}")
            return 0
        return real_main(argv)

    monkeypatch.setattr(cli, "main", barrier_main)
    results = [None, None]

    def one(i):
        results[i] = daemon._request({
            "argv": ["search", f"q{i}"], "stdin": None,
            "cwd": str(tmp_path), "env": {},
        })

    threads = [threading.Thread(target=one, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    for i, resp in enumerate(results):
        assert resp is not None and resp["exit"] == 0
        # output isolation: each reader sees ONLY its own capture
        assert resp["stdout"] == f"served q{i}\n"


def test_concurrent_real_searches_end_to_end(running_daemon, tmp_path):
    """N real stdin searches race through the shared gate; every reply is
    complete, correct, and uncorrupted."""
    corpus = "alpha cat\nbeta database\ngamma tensor\n"
    results = [None] * 6

    def one(i):
        results[i] = daemon._request({
            "argv": ["search", "database", "--top-k", "1", "-n", "0"],
            "stdin": corpus, "cwd": str(tmp_path), "env": {},
        })

    threads = [threading.Thread(target=one, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for resp in results:
        assert resp is not None and resp["exit"] == 0, resp
        assert "<stdin>" in resp["stdout"]
        assert "database" in resp["stdout"]


def test_reader_and_writer_ctx_restore_after_mix(running_daemon, tmp_path):
    """Interleaved reader/writer commands leave the daemon's own cwd/env
    untouched once quiescent."""
    import os

    start_cwd = os.getcwd()
    r1 = daemon._run_command({
        "argv": ["search", "beta", "-n", "0"], "stdin": "alpha\nbeta\n",
        "cwd": str(tmp_path), "env": {"SEMTOOLS_TPU_PLATFORM": "cpu"},
    })
    w1 = daemon._run_command({
        "argv": ["--version"], "stdin": None,
        "cwd": str(tmp_path), "env": {},
    })
    assert r1["exit"] == 0 and w1["exit"] == 0
    assert os.getcwd() == start_cwd


def test_warm_never_creates_a_store(tmp_path, monkeypatch):
    """Warming an ACTIVE but not-yet-indexed workspace must not create its
    store: Store() on a fresh dir would pin the default 256-dim layout
    before the first real search decides the dim from the actual model."""
    from pathlib import Path

    from semtools_tpu.store import Workspace
    from semtools_tpu.store.store import _DB_FILE

    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setenv("SEMTOOLS_TPU_PLATFORM", "cpu")
    monkeypatch.setenv("SEMTOOLS_WORKSPACE", "fresh")
    monkeypatch.setenv(
        "SEMTOOLS_TPU_MODEL_DIR",
        str(Path(__file__).parent / "fixtures" / "potion_mini"),
    )
    daemon._warm()
    ws = Workspace.open("fresh")
    assert not (Path(ws.config.root_dir) / _DB_FILE).exists()
