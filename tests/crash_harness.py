"""SIGKILL crash-injection harness for the workspace store.

The store's write paths document a copy-on-write contract
(``Store.upsert_documents_bulk`` / ``Store.compact`` docstrings): a
process death at ANY instruction leaves every document bytewise equal to
either its last committed state or the in-flight one, never a torn mix,
and the store stays openable, servable, and writable.  This harness
proves that with real kills instead of prose:

* **child mode** — a subprocess mutates a store (upsert / partial edit /
  delete / compact / ANN build) while journaling each operation's intent
  (content digest) *before* executing it and a ``done`` record after.
  The journal is line-buffered: a SIGKILL preserves everything already
  written (the OS page cache survives process death; only power loss
  would lose it, and the contract under test is process-crash safety,
  matching the reference's qdrant-edge process model,
  /root/reference/src/workspace/store.rs:128-170).
* **phase traps** — instead of a timer, the child can arm a trap that
  ``os._exit(137)``'s at a precise point *inside* a write path (before
  the sqlite commit, between the vector flush and the hash-sidecar
  write, after the commit but before the old range is freed, between
  the ANN index's two paired renames, ...).  Each trap pins one ordering
  claim from the docstrings.
* **verifier** — re-opens the store and checks, per document: the
  stored bytes' digest is one of the journal-allowed states; the hash
  sidecar agrees with the vectors; no two live ranges overlap and all
  sit inside the epoch file; a batched search matches brute force over
  the read-back rows; and the store accepts a fresh upsert + compact
  afterwards (no wedged lock, no poisoned allocator).

Used by ``tests/test_crash_safety.py`` (deterministic phase kills, a few
timer kills) and the crash campaign in ``scripts/soak.py`` (many
randomized rounds; ``--crash-rounds N`` sizes it).  Runnable directly::

    python tests/crash_harness.py child <store_dir> <journal> <seed> <steps> [phase]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
from pathlib import Path

# Safe under pytest (conftest already pinned) and as a fresh child
# process on a host whose TPU tunnel may be wedged: never touch a
# device backend from this harness.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SEMTOOLS_TPU_NO_FETCH", "1")
os.environ.setdefault("SEMTOOLS_TPU_ALLOW_FALLBACK", "1")

import numpy as np

DIM = 16
PATHS = [f"/d{i}.txt" for i in range(6)]

# Every phase trap, with the op that triggers it.  Names are
# "<op>-<point>"; the child arms the trap, journals ``begin``, runs the
# op, and the trap kills the process mid-write-path.
PHASES = {
    # upsert_documents_bulk: inside the transaction, before db.commit —
    # the docs rows must roll back to the old state.
    "upsert-pre-commit": "upsert",
    # upsert: after the vector mmap flush, before the hash sidecar write
    # (and therefore before the commit) — old state must survive.
    "upsert-mid-sidecar": "upsert",
    # upsert over an existing path: after the commit, before the
    # replaced range is freed — new state, old range leaks (re-merged by
    # a later compact), nothing torn.
    "upsert-post-commit": "upsert",
    # delete: _free_range runs inside the transaction — doc must survive.
    "delete-pre-commit": "delete",
    # compact: new epoch files fully written, swap transaction not yet
    # committed — old epoch must keep serving, orphan files swept later.
    "compact-pre-swap": "compact",
    # compact: swap committed, instance paths not yet refreshed / old
    # epoch not yet unlinked — new epoch must serve on reopen.
    "compact-post-swap": "compact",
    # build_ann_index: death before the first rename (tmp files only)
    # and between the two paired renames (index new, meta old) — the
    # build-token guard must keep the pair unserved until consistent.
    "ann-pre-publish": "ann",
    "ann-mid-publish": "ann",
}


def digest(rows: np.ndarray) -> str:
    return hashlib.blake2b(
        np.ascontiguousarray(rows, np.float32).tobytes(), digest_size=16
    ).hexdigest()


def content_hashes(rows: np.ndarray) -> np.ndarray:
    """Per-row uint64 content hashes (the lines.h64 convention: 0 means
    unknown, so real hashes set the low bit)."""
    return np.array(
        [
            int.from_bytes(
                hashlib.blake2b(
                    np.ascontiguousarray(r, np.float32).tobytes(), digest_size=8
                ).digest(),
                "little",
            )
            | 1
            for r in rows
        ],
        np.uint64,
    )


def make_rows(rng: np.random.Generator, n: int) -> np.ndarray:
    x = rng.standard_normal((n, DIM)).astype(np.float32)
    nn = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.where(nn > 0, nn, 1)


# ---------------------------------------------------------------------------
# child


def _arm(phase: str) -> None:
    """Install the phase's kill trap.  Patches live only in the child
    process and fire exactly once."""
    import pathlib

    import semtools_tpu.store.store as st

    def boom(*a, **k):
        os._exit(137)

    if phase in ("upsert-pre-commit", "compact-pre-swap"):
        # _bump_generation runs inside the write transaction, immediately
        # before db.commit in both paths.
        st.Store._bump_generation = boom
    elif phase == "upsert-mid-sidecar":
        # called right after the vector mmap flush in the upsert path
        st.Store._hash_mmap = boom
    elif phase in ("upsert-post-commit", "delete-pre-commit"):
        # upsert: first call is after db.commit; delete: inside the txn
        st.Store._free_range = boom
    elif phase == "compact-post-swap":
        # compact calls _refresh_vec_paths right after the swap commit
        st.Store._refresh_vec_paths = boom
    elif phase in ("ann-pre-publish", "ann-mid-publish"):
        target = 1 if phase == "ann-pre-publish" else 2
        orig = pathlib.Path.replace
        calls = {"n": 0}

        def patched(self, other):
            calls["n"] += 1
            if calls["n"] == target:
                os._exit(137)
            return orig(self, other)

        pathlib.Path.replace = patched
    else:  # pragma: no cover - harness bug
        raise ValueError(f"unknown phase {phase!r}")


def child(store_dir: str, journal: str, seed: int, steps: int, phase: str | None):
    """Mutation loop.  With ``phase``: random warmup for ``steps`` ops,
    then one scripted op with the trap armed (exits 137 from inside it).
    Without: loop forever; the parent SIGKILLs at a random time."""
    from semtools_tpu.store.store import Store

    rng = np.random.default_rng(seed)
    s = Store(store_dir, dim=DIM)
    jf = open(journal, "a", buffering=1)

    def record(rec):
        jf.write(json.dumps(rec) + "\n")

    # Readiness handshake: interpreter + imports take seconds, so a
    # parent timing its SIGKILL from spawn would always kill a process
    # that hasn't mutated anything (verifying an empty store proves
    # nothing).  The parent waits for this record before starting its
    # kill timer.
    record({"op": "ready", "phase": "done"})

    def do_upsert(p, n):
        rows = make_rows(rng, n)
        record({"op": "upsert", "path": p, "phase": "begin", "digest": digest(rows)})
        s.upsert_document_lines(p, rows, content_hashes(rows))
        record({"op": "upsert", "path": p, "phase": "done", "digest": digest(rows)})

    def do_delete(p):
        record({"op": "delete", "path": p, "phase": "begin"})
        s.delete_line_embeddings([p])
        record({"op": "delete", "path": p, "phase": "done"})

    def do_compact():
        record({"op": "compact", "phase": "begin"})
        s.compact()
        record({"op": "compact", "phase": "done"})

    def do_ann():
        record({"op": "ann", "phase": "begin"})
        s.build_ann_index(force=True)
        record({"op": "ann", "phase": "done"})

    live = set()

    def random_op():
        r = rng.random()
        p = PATHS[int(rng.integers(0, len(PATHS)))]
        if r < 0.6 or not live:
            do_upsert(p, int(rng.integers(1, 60)))
            live.add(p)
        elif r < 0.75:
            victim = sorted(live)[int(rng.integers(0, len(live)))]
            do_delete(victim)
            live.discard(victim)
        elif r < 0.88:
            do_compact()
        else:
            do_ann()

    if phase is None:
        while True:  # parent kills us
            random_op()

    # Deterministic warmup, then the scripted op under the trap.  The
    # warmup guarantees the trap's op has work to do (an existing path
    # to replace/delete, a hole so compact actually moves rows).
    for _ in range(steps):
        random_op()
    anchor = sorted(live)[0] if live else PATHS[0]
    if not live:
        do_upsert(anchor, 8)
        live.add(anchor)
    if PHASES[phase] == "compact":
        # Punch a hole below the survivors so compact has moves.
        if len(live) < 2:
            do_upsert(PATHS[1], 8)
            live.add(PATHS[1])
        do_delete(sorted(live)[0])
    if PHASES[phase] == "ann":
        # A fresh index is a documented no-op (build_ann_index early
        # return) — if the last warmup op happened to build one, the
        # scripted build would never reach the publish renames.  Bump the
        # generation so the build really runs.
        do_upsert(anchor, 9)
    _arm(phase)
    op = PHASES[phase]
    if op == "upsert":
        do_upsert(anchor, 12)  # replaces an existing block
    elif op == "delete":
        do_delete(anchor)
    elif op == "compact":
        do_compact()
    else:
        do_ann()
    # The trap must have fired inside the op; reaching here is a harness
    # bug the parent detects via exit code 0.
    sys.exit(0)


# ---------------------------------------------------------------------------
# verifier

MISSING = object()


class CrashVerifyError(AssertionError):
    pass


def _journal_state(journal: str):
    """Replay the journal: committed state per path (digest, or None for
    a committed delete) + the in-flight record, if any."""
    committed: dict[str, str | None] = {}
    inflight = None
    with open(journal) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if rec["phase"] == "begin":
                inflight = rec
            else:
                if rec["op"] == "upsert":
                    committed[rec["path"]] = rec["digest"]
                elif rec["op"] == "delete":
                    committed[rec["path"]] = None
                inflight = None
    return committed, inflight


def verify(store_dir: str, journal: str) -> int:
    """Re-open the crashed store and check every invariant.  Returns the
    number of checks performed; raises CrashVerifyError on violation."""
    from semtools_tpu.store.store import Store

    committed, inflight = _journal_state(journal)
    checks = 0

    def ensure(ok, msg):
        nonlocal checks
        checks += 1
        if not ok:
            raise CrashVerifyError(f"{msg} (journal={journal})")

    s = Store(store_dir, dim=DIM)  # must open cleanly — no damage error
    checks += 1
    try:
        docs = {
            r[0]: (int(r[1]), int(r[2]))
            for r in s.db.execute(
                "SELECT path, slot_start, n_lines FROM docs"
                " WHERE slot_start IS NOT NULL"
            )
        }
        cap = s._capacity()
        mm = s._mmap("r")
        hm = s._hash_mmap("r")

        # live ranges: in-bounds, pairwise disjoint
        spans = sorted((st, st + n) for st, n in docs.values() if n)
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            ensure(a1 <= b0, f"overlapping live ranges {(a0, a1)} / {(b0, b1)}")
        if spans:
            ensure(spans[-1][1] <= cap, f"live range {spans[-1]} beyond capacity {cap}")
        # free ranges must not intersect live ranges
        for fst, fln in s.db.execute("SELECT start, length FROM free"):
            for st_, n in docs.values():
                ensure(
                    fst + fln <= st_ or st_ + n <= fst,
                    f"free range ({fst},{fln}) overlaps live ({st_},{n})",
                )

        read_rows = {}
        for path, (st_, n) in docs.items():
            rows = np.array(mm[st_ : st_ + n]) if n else np.empty((0, DIM), np.float32)
            read_rows[path] = rows
            dig = digest(rows)
            allowed = set()
            c = committed.get(path, MISSING)
            if c not in (MISSING, None):
                allowed.add(c)
            if (
                inflight
                and inflight["op"] == "upsert"
                and inflight["path"] == path
            ):
                allowed.add(inflight["digest"])
            ensure(
                dig in allowed,
                f"{path}: stored bytes match NEITHER the committed nor the "
                f"in-flight state (torn write?) got={dig} allowed={allowed} "
                f"committed={c if c is not MISSING else '<absent>'} inflight={inflight}",
            )
            if hm is not None and n:
                ensure(
                    (np.array(hm[st_ : st_ + n]) == content_hashes(rows)).all(),
                    f"{path}: hash sidecar disagrees with stored vectors",
                )

        for path, c in committed.items():
            if c is None:
                ensure(
                    path not in docs
                    or (
                        inflight
                        and inflight["op"] == "upsert"
                        and inflight["path"] == path
                    ),
                    f"{path}: committed delete but rows still present",
                )
            else:
                ensure(
                    path in docs
                    or (
                        inflight
                        and inflight["op"] == "delete"
                        and inflight["path"] == path
                    ),
                    f"{path}: committed rows lost by the crash",
                )

        # servability: batched search must equal brute force over the
        # bytes we just read back (whatever consistent state won) — on
        # the default tier AND with the ANN tier forced.  The forced
        # pass is what pins the ann-mid-publish ordering claim: a kill
        # between the paired renames leaves a new index next to an old
        # meta, and the build-token guard must keep that pair unserved
        # (fall through to exact tiers) instead of pairing slots from
        # different builds.  Without FORCE_ANN the tiny verifier corpus
        # sits far below the ANN auto-threshold and would never consult
        # the mismatched pair at all.
        paths = sorted(docs)
        if paths and sum(len(read_rows[p]) for p in paths):
            from semtools_tpu.store import device_cache

            rows = np.concatenate([read_rows[p] for p in paths], axis=0)
            rng = np.random.default_rng(99)
            qs = make_rows(rng, 3)
            # int4 leg: the packed tier rebuilds its device corpus from
            # the surviving mmap bytes, and its packed-slot writes carry
            # their own zero-byte contract (PACKED_ZERO_BYTE,
            # ops/int4_scan.py) — a post-crash corpus with torn/zero rows
            # must still pack and serve exactly.
            tier_envs = (
                {},
                {"SEMTOOLS_TPU_STORE_INT4": "1"},
                {"SEMTOOLS_TPU_FORCE_ANN": "1"},
            )
            saved = {
                k: os.environ.get(k)
                for t in tier_envs for k in t
            }
            for tier_env in tier_envs:
                if tier_env:
                    os.environ.update(tier_env)
                    device_cache.invalidate()
                try:
                    per = s.search_line_embeddings_batched(qs, paths, 4)
                    for r in range(len(qs)):
                        dist = 1.0 - rows @ qs[r]
                        order = np.argsort(dist, kind="stable")[: min(4, len(dist))]
                        got = per[r]
                        ensure(
                            len(got) == len(order)
                            and all(
                                abs(h.distance - float(dist[j])) < 3e-4
                                for h, j in zip(got, order)
                            ),
                            f"post-crash search mismatch q={r} "
                            f"tier_env={tier_env}",
                        )
                finally:
                    if tier_env:
                        for k in tier_env:
                            if saved[k] is None:
                                os.environ.pop(k, None)
                            else:
                                os.environ[k] = saved[k]
                        device_cache.invalidate()

        # writability: the crash must not wedge the lock, allocator, or
        # epoch bookkeeping
        rng = np.random.default_rng(100)
        fresh = make_rows(rng, 5)
        s.upsert_document_lines("/post-crash.txt", fresh, content_hashes(fresh))
        got = s.search_line_embeddings(fresh[0], ["/post-crash.txt"], top_k=1)
        ensure(
            got and got[0].distance < 3e-4,
            "post-crash upsert not servable",
        )
        s.compact()
        got = s.search_line_embeddings(fresh[0], ["/post-crash.txt"], top_k=1)
        ensure(
            got and got[0].distance < 3e-4,
            "post-crash compact lost the new document",
        )
    finally:
        s.close()
    return checks


# ---------------------------------------------------------------------------
# round driver (shared by the pytest scenarios and the soak campaign)


def child_argv(store_dir: str, journal: str, seed: int, steps: int, phase: str | None):
    argv = [
        sys.executable,
        os.path.abspath(__file__),
        "child",
        store_dir,
        journal,
        str(seed),
        str(steps),
    ]
    if phase:
        argv.append(phase)
    return argv


def run_round(
    tmpdir: str,
    seed: int,
    phase: str | None,
    steps: int = 12,
    kill_after: float = 0.4,
) -> int:
    """One kill+verify round.  Returns verifier checks performed."""
    import signal
    import subprocess
    import time

    store_dir = os.path.join(tmpdir, "ws")
    journal = os.path.join(tmpdir, "journal.jsonl")
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        SEMTOOLS_TPU_PLATFORM="cpu",
        SEMTOOLS_TPU_NO_FETCH="1",
        SEMTOOLS_TPU_ALLOW_FALLBACK="1",
        # fresh child processes share the suite's compile cache so an ANN
        # build mid-round costs milliseconds, not a cold XLA compile
        JAX_COMPILATION_CACHE_DIR="/tmp/semtools_tpu_jax_cache",
    )
    proc = subprocess.Popen(
        child_argv(store_dir, journal, seed, steps, phase),
        env=env,
        stdout=subprocess.DEVNULL,
        # timer mode never reads stderr — DEVNULL it so a chatty child
        # (JAX logging) can't fill an undrained pipe and stall forever
        stderr=subprocess.PIPE if phase else subprocess.DEVNULL,
    )
    if phase is None:
        # Wait for the child's readiness record: interpreter + import
        # startup takes seconds, so timing the kill from spawn would
        # reliably kill a process that hasn't touched the store yet.
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if os.path.exists(journal) and os.path.getsize(journal) > 0:
                break
            if proc.poll() is not None:
                raise CrashVerifyError(
                    f"timer child died during startup (exit {proc.returncode})"
                )
            time.sleep(0.01)
        else:
            proc.kill()
            raise CrashVerifyError("timer child never became ready")
        time.sleep(kill_after)
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
        if proc.returncode != -signal.SIGKILL:
            raise CrashVerifyError(
                f"timer child exited {proc.returncode} before the kill — "
                f"round proves nothing (the mutation loop is infinite)"
            )
    else:
        _, err = proc.communicate(timeout=300)
        if proc.returncode != 137:
            raise CrashVerifyError(
                f"phase {phase!r}: trap never fired (exit {proc.returncode}); "
                f"stderr:\n{err.decode(errors='replace')[-2000:]}"
            )
    return verify(store_dir, journal)


if __name__ == "__main__":
    if len(sys.argv) >= 6 and sys.argv[1] == "child":
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        # Env-level JAX_PLATFORMS is NOT enough on hosts whose TPU plugin
        # prepends itself to the platform list; a wedged tunnel then
        # blocks backend init forever.  Pin at config level before any
        # backend use (same guard as tests/conftest.py).
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/semtools_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        child(
            sys.argv[2],
            sys.argv[3],
            int(sys.argv[4]),
            int(sys.argv[5]),
            sys.argv[6] if len(sys.argv) > 6 else None,
        )
    else:  # pragma: no cover
        print(__doc__)
        sys.exit(2)
