"""Daemon mode: a resident process that keeps the model + jitted
executables warm across CLI invocations.

SURVEY.md §7 flags per-invocation cold start (XLA compile + weight load)
as the structural latency of a CLI on an accelerator. The persistent
compile cache (utils/platform.py) removes recompiles; the daemon removes
the rest — process start, jax init, model load, weight upload — by
running commands inside one long-lived process.

Protocol: newline-delimited JSON over a unix socket
(``~/.semtools/daemon.sock``):

    -> {"argv": [...], "stdin": "..."|null, "cwd": "...", "env": {...}}
    <- {"stdout": "...", "stderr": "...", "exit": 0}

The client is transparent: ``semtools`` forwards to a running daemon when
``SEMTOOLS_TPU_DAEMON=1`` (or ``auto`` + socket present). Start one with
``semtools daemon start`` (foreground: ``semtools daemon run``).

Mutating commands run one at a time under an exclusive gate. Read-only
commands (`search`, `workspace status`) run CONCURRENTLY when they share
an execution context (cwd + forwarded env): queries scan a frozen
generation of the store (the compaction design's epoch copy-on-write
keeps superseded epochs immutable for lock-free readers), so N parallel
agent tool calls cost ~one batched search instead of N serialized scans.
Output is captured, so TTY-dependent ANSI highlighting is off in daemon
mode (same behavior as any piped invocation).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import socket
import socketserver
import sys
import threading
import time
from pathlib import Path
from typing import Optional

_SOCK_NAME = "daemon.sock"


def supported() -> bool:
    """Daemon transport availability: unix sockets with POSIX permission
    semantics. Windows' AF_UNIX (when present) lacks the chmod-based
    owner-only access control serve() relies on, so the daemon degrades
    to 'unsupported' there — every command simply runs locally (the
    client path returns None and the CLI executes in-process)."""
    return os.name == "posix" and hasattr(socket, "AF_UNIX")


def socket_path() -> Path:
    base = os.environ.get("SEMTOOLS_TPU_DAEMON_DIR") or os.path.join(
        os.path.expanduser("~"), ".semtools"
    )
    return Path(base) / _SOCK_NAME


# -- server -----------------------------------------------------------------


def _read_only(argv) -> bool:
    """Commands that never need the exclusive gate.

    `search` and `workspace status` are queries: they read the store at a
    frozen generation (epoch copy-on-write keeps superseded vector files
    immutable), and the incremental upsert a workspace search may perform
    for changed files is already safe under concurrent writers — the
    store's cross-process flock (one per Store instance, so it also
    serializes threads), idempotent copy-on-write upserts, and
    generation-keyed device-cache invalidation are exactly the mechanisms
    the daemon-vs-CLI-writer soak exercises across processes. Everything
    else (parse, workspace index/compact/prune/use, ask) stays exclusive.
    """
    if argv and argv[0] == "search":
        return True
    return len(argv) >= 2 and argv[0] == "workspace" and argv[1] == "status"


def _install_ctx(cwd, env_overrides):
    """Apply a request's cwd + env to the process; returns restore state.

    Only ever called while NO other command is mid-flight (the gate
    guarantees it), so mutating process globals is safe — and os.environ
    is the daemon's own pristine environment at that instant, which is
    why the stale-SEMTOOLS_*-unset list is computed HERE: the request env
    is authoritative for the whole forwardable SEMTOOLS_ namespace, so
    any such var set in the daemon's env but absent from the request is
    unset for the command's duration. (Computing the unset list earlier,
    from a live os.environ another reader may have already mutated, made
    two identical requests hash to different contexts.)
    """
    effective = dict(env_overrides)
    for k in list(os.environ):
        if (
            k.startswith("SEMTOOLS_")
            and k not in effective
            and _env_key_forwardable(k)
        ):
            effective[k] = None
    saved_cwd = os.getcwd()
    saved_env = {k: os.environ.get(k) for k in effective}
    if cwd:
        os.chdir(cwd)
    for k, v in effective.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    return saved_cwd, saved_env


def _restore_ctx(state) -> None:
    saved_cwd, saved_env = state
    os.chdir(saved_cwd)
    for k, v in saved_env.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


class _Gate:
    """Reader/writer gate with execution-context matching.

    Readers (read-only commands) share the gate when their execution
    context — (cwd, env overrides) — is IDENTICAL: the process-global
    cwd/env is installed once by the first reader in and restored by the
    last reader out, so concurrent readers all see the context they
    asked for. An agent's parallel tool calls come from one process and
    therefore one context; a reader with a different context simply
    waits like a writer would. Writers are fully exclusive.

    Acquisition is bounded by the daemon's busy wait — a caller that
    cannot start in time gets ``{"busy": true}`` and runs locally, same
    contract as the old single lock.
    """

    def __init__(self) -> None:
        self._cond = threading.Condition()
        self._readers = 0
        self._writer = False
        self._ctx = None
        self._saved = None

    def acquire_reader(self, cwd, env_overrides, timeout: float) -> bool:
        ctx = (cwd or None, tuple(sorted(env_overrides.items())))
        deadline = time.monotonic() + timeout
        with self._cond:
            while self._writer or (self._readers > 0 and self._ctx != ctx):
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return False
                self._cond.wait(remaining)
            if self._readers == 0:
                self._saved = _install_ctx(cwd, env_overrides)
                self._ctx = ctx
            self._readers += 1
            return True

    def release_reader(self) -> None:
        with self._cond:
            self._readers -= 1
            if self._readers == 0:
                _restore_ctx(self._saved)
                self._saved = None
                self._ctx = None
            self._cond.notify_all()

    def acquire_writer(self, timeout: float) -> bool:
        deadline = time.monotonic() + timeout
        with self._cond:
            while self._writer or self._readers > 0:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return False
                self._cond.wait(remaining)
            self._writer = True
            return True

    def release_writer(self) -> None:
        with self._cond:
            self._writer = False
            self._cond.notify_all()


_gate = _Gate()


class _StreamRouter:
    """sys.stdout/stderr/stdin shim routing per-thread capture buffers.

    Concurrent reader commands each push their own StringIO; any thread
    without a pushed buffer (the daemon's own logging, exclusive
    commands' worker threads under plain global redirection) falls back
    to the underlying stream. Attribute access (isatty, encoding, ...)
    delegates to whichever target is active for the calling thread, so a
    captured command sees StringIO semantics (isatty() False) exactly as
    under contextlib.redirect_stdout.
    """

    def __init__(self, fallback) -> None:
        self._fallback = fallback
        self._local = threading.local()

    def _target(self):
        return getattr(self._local, "stream", None) or self._fallback

    def push(self, stream) -> None:
        self._local.stream = stream

    def pop(self) -> None:
        self._local.stream = None

    def write(self, s):
        return self._target().write(s)

    def read(self, *a):
        return self._target().read(*a)

    def readline(self, *a):
        return self._target().readline(*a)

    def flush(self):
        return self._target().flush()

    def __getattr__(self, name):
        return getattr(self._target(), name)

    def __iter__(self):
        return iter(self._target())


_routers_lock = threading.Lock()
_routers = None


def _ensure_routers():
    """Install the stream routers (idempotent, thread-safe).

    Installed lazily on the first concurrent-capable command rather than
    at import so plain CLI processes never pay the indirection. If some
    other stream-capture machinery displaced a router from sys.* since
    (pytest's capsys does this between tests), re-install it with the
    displacing stream as the new fallback — only ever done while no
    reader is mid-flight for that stream's gate, and pushed thread-local
    buffers are unaffected either way.
    """
    global _routers
    with _routers_lock:
        if _routers is None:
            _routers = (
                _StreamRouter(sys.stdout),
                _StreamRouter(sys.stderr),
                _StreamRouter(sys.stdin),
            )
        r_out, r_err, r_in = _routers
        if sys.stdout is not r_out:
            r_out._fallback = sys.stdout
            sys.stdout = r_out
        if sys.stderr is not r_err:
            r_err._fallback = sys.stderr
            sys.stderr = r_err
        if sys.stdin is not r_in:
            r_in._fallback = sys.stdin
            sys.stdin = r_in
        return _routers


def _busy_wait_s() -> float:
    """How long a forwarded command queues behind the one the daemon is
    already running before the daemon answers ``{"busy": true}`` and the
    client executes locally instead. Long enough that two racing warm
    searches (~tens of ms each) still both get served warm; short enough
    that a trivial ``workspace status`` never queues behind a 35-minute
    index build. Local fallback here duplicates NOTHING — the daemon
    never started the busy caller's command (unlike a client-side
    timeout mid-execution, which is why the socket timeout stays 4 h)."""
    try:
        return float(os.environ.get("SEMTOOLS_TPU_DAEMON_BUSY_WAIT_S", "10"))
    except ValueError:
        return 10.0


def _max_request_bytes() -> int:
    """One-line request size cap. Any local process can open the socket,
    so an endless line must not grow the daemon's heap without bound; a
    legitimate over-cap request (giant piped stdin) is told to run
    locally instead (see ``forward``'s matching client-side check)."""
    try:
        return int(os.environ.get("SEMTOOLS_TPU_DAEMON_MAX_REQUEST", str(64 << 20)))
    except ValueError:
        return 64 << 20


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:  # one request per connection
        cap = _max_request_bytes()
        line = self.rfile.readline(cap + 2)
        if not line:
            return
        if len(line.rstrip(b"\n")) > cap:
            # Oversized request (payload beyond the cap, newline
            # excluded): no "exit" key means both clients fall back to
            # running the command locally. (An under-cap line without a
            # trailing newline — EOF mid-send — still parses.)
            self._reply({"too_large": True})
            return
        try:
            req = json.loads(line)
        except (json.JSONDecodeError, UnicodeDecodeError, ValueError):
            self._reply({"stdout": "", "stderr": "daemon: bad request\n", "exit": 2})
            return
        if not isinstance(req, dict):
            self._reply({"stdout": "", "stderr": "daemon: bad request\n", "exit": 2})
            return
        if req.get("op") == "ping":
            self._reply({"ok": True, "pid": os.getpid()})
            return
        if req.get("op") == "stop":
            self._reply({"ok": True})
            threading.Thread(target=self.server.shutdown, daemon=True).start()
            return
        self._reply(_run_command(req))

    def _reply(self, obj) -> None:
        self.wfile.write(json.dumps(obj).encode() + b"\n")


def _env_key_forwardable(key: str) -> bool:
    """Server-side allowlist for client env overrides.

    The whole SEMTOOLS_* namespace is forwardable EXCEPT the daemon's own
    control knobs (a client override of SEMTOOLS_TPU_DAEMON could make
    in-daemon commands forward to the daemon recursively), plus the API
    credentials and HOME the commands resolve configs/keys from.
    """
    if key in ("SEMTOOLS_TPU_DAEMON", "SEMTOOLS_TPU_DAEMON_DIR"):
        return False
    if key.startswith("SEMTOOLS_"):
        return True
    return key in ("OPENAI_API_KEY", "OPENAI_BASE_URL", "LLAMA_CLOUD_API_KEY", "HOME")


def _run_command(req) -> dict:
    from semtools_tpu.cli import main as cli_main

    argv = req.get("argv") or []
    stdin_text = req.get("stdin")
    cwd = req.get("cwd")
    env_in = req.get("env") or {}
    # Shape-check before anything runs: a malformed request from a buggy
    # or hostile local caller gets a clean reply, not a dead handler
    # thread (the command has not started, so exit 2 is honest).
    if (
        not isinstance(argv, list)
        or not all(isinstance(a, str) for a in argv)
        or not isinstance(stdin_text, (str, type(None)))
        or not isinstance(cwd, (str, type(None)))
        or not isinstance(env_in, dict)
        or not all(
            isinstance(k, str) and isinstance(v, (str, type(None)))
            for k, v in env_in.items()
        )
    ):
        return {"stdout": "", "stderr": "daemon: bad request\n", "exit": 2}
    # Filtered request env only; the authoritative unset of stale daemon
    # SEMTOOLS_* state happens inside _install_ctx, against the pristine
    # process env (see its docstring).
    env_overrides = {k: v for k, v in env_in.items() if _env_key_forwardable(k)}

    if _read_only(argv):
        return _run_reader(argv, stdin_text, cwd, env_overrides)

    if not _gate.acquire_writer(timeout=_busy_wait_s()):
        return {"busy": True}
    try:
        ctx_state = _install_ctx(cwd, env_overrides)
        out, err = io.StringIO(), io.StringIO()
        try:
            stdin = io.StringIO(stdin_text) if stdin_text is not None else io.StringIO()
            with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
                old_stdin = sys.stdin
                sys.stdin = stdin
                try:
                    code = cli_main(argv)
                finally:
                    sys.stdin = old_stdin
        except SystemExit as e:
            # argparse exits with int codes; anything else (a message
            # string) is a failure, and the conversion itself must never
            # raise mid-cleanup.
            code = e.code if isinstance(e.code, int) else (0 if e.code is None else 1)
        except Exception as e:  # never kill the daemon on a command error
            err.write(f"Error: {e}\n")
            code = 1
        finally:
            _restore_ctx(ctx_state)
        return {"stdout": out.getvalue(), "stderr": err.getvalue(), "exit": code}
    finally:
        _gate.release_writer()


def _run_reader(argv, stdin_text, cwd, env_overrides) -> dict:
    """Execute a read-only command under the shared side of the gate.

    Capture goes through the thread-local stream routers instead of
    contextlib's global redirection, so concurrent readers never see each
    other's output; cwd/env are installed by the gate (first reader in,
    last reader out, contexts proven identical)."""
    from semtools_tpu.cli import main as cli_main

    if not _gate.acquire_reader(cwd, env_overrides, timeout=_busy_wait_s()):
        return {"busy": True}
    try:
        r_out, r_err, r_in = _ensure_routers()
        out, err = io.StringIO(), io.StringIO()
        stdin = io.StringIO(stdin_text) if stdin_text is not None else io.StringIO()
        r_out.push(out)
        r_err.push(err)
        r_in.push(stdin)
        try:
            code = cli_main(argv)
        except SystemExit as e:
            code = e.code if isinstance(e.code, int) else (0 if e.code is None else 1)
        except Exception as e:  # never kill the daemon on a command error
            err.write(f"Error: {e}\n")
            code = 1
        finally:
            r_out.pop()
            r_err.pop()
            r_in.pop()
        return {"stdout": out.getvalue(), "stderr": err.getvalue(), "exit": code}
    finally:
        _gate.release_reader()


class _Server(socketserver.ThreadingUnixStreamServer):
    daemon_threads = True
    allow_reuse_address = True


def serve(warm: bool = True) -> None:
    """Run the daemon in the foreground until stopped."""
    if not supported():
        raise RuntimeError(
            "the semtools daemon requires unix sockets and is unsupported "
            "on this platform; commands run locally without it"
        )
    # Commands executed inside the daemon must never forward to the daemon.
    os.environ["SEMTOOLS_TPU_DAEMON"] = "off"
    path = socket_path()
    # The socket executes arbitrary commands as this user with
    # client-supplied cwd/env — it must never be reachable by other local
    # users, whatever the umask. Owner-only dir + socket.
    path.parent.mkdir(parents=True, exist_ok=True, mode=0o700)
    os.chmod(path.parent, 0o700)
    if path.exists():
        path.unlink()
    if warm:
        _warm()
    # From here on, commands run IN-PROCESS on behalf of clients: a
    # tripped backend-init watchdog must raise into that command's error
    # reply, never execve the resident daemon (platform.ensure_backend).
    # The daemon's OWN bring-up (cli `daemon run` gate + _warm above) may
    # still re-exec to CPU — that happens before this point.
    from semtools_tpu.utils.platform import disallow_reexec

    disallow_reexec()
    # Concurrent read-only searches arriving within a small window merge
    # into one batched device scan (store/coalesce.py) — behind a
    # tunneled link, per-request readback otherwise costs ~one link RTT
    # each while one batched scan costs ~one total.
    from semtools_tpu.store import coalesce

    coalesce.enable()
    with _Server(str(path), _Handler) as server:
        os.chmod(path, 0o600)
        print(f"semtools daemon listening on {path}", file=sys.stderr)
        try:
            server.serve_forever()
        finally:
            with contextlib.suppress(OSError):
                path.unlink()


def _warm() -> None:
    """Load the model and compile the common executables up front; if a
    workspace is active, pull its corpus into the device cache too."""
    try:
        from semtools_tpu.models.static_model import MODEL_NAME, load_model

        # Same model resolution as the CLI (SEMTOOLS_TPU_MODEL env) — the
        # default name would be wrong for custom-model setups.
        model = load_model(os.environ.get("SEMTOOLS_TPU_MODEL", MODEL_NAME))
        model.encode(["warmup line"], max_length=2048)
        q = model.encode_single("warmup")
    except Exception as e:
        print(f"daemon: warmup skipped ({e})", file=sys.stderr)
        return
    try:
        from semtools_tpu.store import NoActiveWorkspace, Store, Workspace

        ws = Workspace.open()  # raises when no workspace is active
    except NoActiveWorkspace:
        return
    except Exception as e:
        print(f"daemon: workspace warm skipped ({e})", file=sys.stderr)
        return
    try:
        from semtools_tpu.store.store import _DB_FILE

        if not (Path(ws.config.root_dir) / _DB_FILE).exists():
            # A warm-up must never CREATE a store either: Store() on a
            # fresh workspace would pin the default 256-dim layout before
            # the first real search decides the dim from the actual model
            # (found via the daemon-parallel bench: a 64-dim model then
            # failed every upsert against the warm-created 256-dim store).
            return
        # Open WITHOUT a model name: passing one would invalidate stored
        # rows when the workspace was built with a different model — a
        # warm-up must never mutate the store.
        with Store(ws.config.root_dir) as store:
            if store.dim != model.dim:
                print(
                    f"daemon: workspace '{ws.config.name}' uses dim "
                    f"{store.dim} != model dim {model.dim}; not warmed",
                    file=sys.stderr,
                )
                return
            paths = store.get_all_document_paths()
            if paths:
                store.search_line_embeddings(q, paths, top_k=1)
                print(
                    f"daemon: workspace '{ws.config.name}' corpus warmed "
                    f"({len(paths)} documents)",
                    file=sys.stderr,
                )
    except Exception as e:
        print(f"daemon: workspace warm failed ({e})", file=sys.stderr)


# -- client -----------------------------------------------------------------


def _request(obj, timeout: float = 600.0) -> Optional[dict]:
    if not supported():
        return None
    path = socket_path()
    if not path.exists():
        return None
    try:
        with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
            s.settimeout(timeout)
            s.connect(str(path))
            s.sendall(json.dumps(obj).encode() + b"\n")
            buf = b""
            while not buf.endswith(b"\n"):
                chunk = s.recv(1 << 20)
                if not chunk:
                    break
                buf += chunk
        return json.loads(buf) if buf else None
    except (OSError, json.JSONDecodeError):
        return None


def ping() -> bool:
    resp = _request({"op": "ping"}, timeout=5.0)
    return bool(resp and resp.get("ok"))


def stop() -> bool:
    resp = _request({"op": "stop"}, timeout=5.0)
    return bool(resp and resp.get("ok"))


def _forward_timeout(argv) -> float:
    """Client timeout for a forwarded command: uniformly long (4 h).

    Almost any command can legitimately run for a long time — index
    builds (a 10M-row IVF-PQ build measured 35 min on one core), parse
    jobs (remote polls up to max_timeout=3600 s), and a cold `search`
    over a large un-indexed corpus (the embed stage alone measured 277 s
    at 500k rows on a degraded link; a multi-million-line corpus far
    exceeds the old 600 s cap). A shorter per-shape cap was worse than
    useless: the client would abandon the socket and re-run the SAME
    command locally while the daemon kept executing it under the store
    flock — duplicated work and a doubled wall clock. Queueing behind a
    BUSY daemon is bounded separately: the server answers
    ``{"busy": true}`` after ``_busy_wait_s`` and the client runs the
    (never-started) command locally — so the long socket timeout only
    ever covers a command the daemon actually accepted."""
    del argv
    return 4 * 3600.0


def forward(argv, stdin_text: Optional[str]) -> Optional[int]:
    """Run ``argv`` on the daemon; None if no daemon is reachable."""
    # Forward the client's whole SEMTOOLS_* namespace plus credentials and
    # HOME; keys the client has UNSET are implicitly unset server-side (the
    # daemon treats the request env as authoritative for SEMTOOLS_*), so
    # daemon-start-time state like SEMTOOLS_TPU_STORE_INT8 or
    # SEMTOOLS_WORKSPACE never leaks into a client that cleared it.
    if stdin_text is not None:
        # Don't ship a request the daemon will refuse. json.dumps with
        # ensure_ascii expands non-ASCII to \uXXXX (up to 12 bytes per
        # char), so character count is not a safe proxy: take the cheap
        # all-ASCII bound first and pay for an exact encode only in the
        # gray zone. 64 KiB covers the argv/env/cwd envelope.
        cap = _max_request_bytes() - 65536
        # 12 = true worst case bytes/char (astral -> \uD8xx\uDExx); when
        # even that bound fits, skip the exact encode entirely.
        if len(stdin_text) * 12 > cap and len(json.dumps(stdin_text)) > cap:
            return None
    env = {k: v for k, v in os.environ.items() if _env_key_forwardable(k)}
    for k in ("OPENAI_API_KEY", "OPENAI_BASE_URL", "LLAMA_CLOUD_API_KEY", "HOME"):
        env[k] = os.environ.get(k)
    resp = _request({
        "argv": list(argv),
        "stdin": stdin_text,
        "cwd": os.getcwd(),
        "env": env,
    }, timeout=_forward_timeout(list(argv)))
    if resp is None or "exit" not in resp:
        # unreachable, torn reply, or {"busy": true} — run locally (the
        # daemon never started a busy caller's command, so nothing is
        # duplicated)
        return None
    sys.stdout.write(resp.get("stdout", ""))
    sys.stderr.write(resp.get("stderr", ""))
    return int(resp["exit"])


def should_forward(argv) -> bool:
    """Forward when enabled and the command isn't daemon management."""
    if not supported():
        return False
    mode = os.environ.get("SEMTOOLS_TPU_DAEMON", "auto").lower()
    if mode in ("0", "off", "never", ""):
        return False
    if argv and argv[0] == "daemon":
        return False
    if mode in ("1", "on", "always"):
        return True
    return socket_path().exists()  # auto
