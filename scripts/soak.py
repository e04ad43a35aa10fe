"""Randomized serving-stack soak: store tiers + workspace layer vs brute force.

Bigger, slower cousin of tests/test_fuzz.py — run it after serving-path
changes (it caught the zero-slot candidate-crowding bug the fixed-seed
fuzz missed). Four campaigns:

1. store: random upsert/delete/search op sequences across every serving
   tier, random top_k/threshold/subset/batch shapes, degenerate rows
   (zeros, duplicates), odd dims;
2. workspace: random file writes/edits/deletes + searches through
   search_with_workspace (line reuse + change detection + ignore_case),
   verified against ground truth recomputed from file contents;
3. daemon: forwarded searches racing direct-CLI writer processes;
4. crash: SIGKILL injection — phase traps + random-instant kills of a
   child mutator, verified against the copy-on-write contract
   (tests/crash_harness.py).

Usage:
    python scripts/soak.py [--steps 120] [--seeds 4] [--crash-rounds N]

Exit code 1 on any mismatch. CPU-only (forces the cpu platform).
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/semtools_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

TIERS = [
    {},
    {"SEMTOOLS_TPU_STORE_INT8": "1"},
    {"SEMTOOLS_TPU_SHARDED": "1"},
    {"SEMTOOLS_TPU_SHARDED": "1", "SEMTOOLS_TPU_STORE_INT8": "1"},
    {"SEMTOOLS_TPU_REDUCED_DIM": "8", "SEMTOOLS_TPU_DEVICE_CACHE_BYTES": "6000"},
    {"SEMTOOLS_TPU_SCAN": "host"},
    # IVF-PQ tier under mutation churn: the soak rebuilds the index after
    # every write (see soak_store), so full-store queries serve from the
    # probe; at soak scale the pool-scaled candidate depth covers every
    # row, making the exact re-rank brute-force-equal. Subset queries and
    # stale-generation windows fall through to exact paths — also checked.
    {"SEMTOOLS_TPU_FORCE_ANN": "1"},
    # Capacity rungs (r5): int4 packed serving — forced, sharded, and
    # policy-selected by budget squeeze — so the randomized
    # mutate/search campaign exercises split-half packing, the
    # margin-complete candidate pools, and patched packed slots, not
    # just the directed tests. The budget numbers straddle the
    # soak-scale corpus (up to ~300 rows x 13/16 B int8): int8 blows
    # 2600 B early while int4 fits, and 1800 B forces the reduced rung
    # mid-churn as the corpus grows.
    {"SEMTOOLS_TPU_STORE_INT4": "1"},
    {"SEMTOOLS_TPU_SHARDED": "1", "SEMTOOLS_TPU_STORE_INT4": "1"},
    {"SEMTOOLS_TPU_DEVICE_CACHE_BYTES": "2600"},
    {"SEMTOOLS_TPU_REDUCED_DIM": "8", "SEMTOOLS_TPU_DEVICE_CACHE_BYTES": "1800"},
]
CLEAR = [
    "SEMTOOLS_TPU_STORE_INT8", "SEMTOOLS_TPU_SHARDED", "SEMTOOLS_TPU_REDUCED_DIM",
    "SEMTOOLS_TPU_DEVICE_CACHE_BYTES", "SEMTOOLS_TPU_SCAN",
    "SEMTOOLS_TPU_SUBSET_DEVICE", "SEMTOOLS_TPU_FORCE_ANN",
    "SEMTOOLS_TPU_STORE_INT4",
]


def make_rows(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    nn = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(nn > 0, nn, 1)
    for i in range(n):
        r = rng.random()
        if r < 0.08:
            x[i] = 0.0
        elif r < 0.2 and i > 0:
            x[i] = x[int(rng.integers(0, i))]
    return x


def content_hashes(rows):
    """Content-derived per-row hashes (like lines.h64): re-upserting a
    partially-edited doc then exercises the row-level patch diff's
    device-side moves, not just full-range uploads."""
    import hashlib

    return np.array(
        [
            int.from_bytes(
                hashlib.blake2b(r.tobytes(), digest_size=8).digest(), "little"
            )
            | 1
            for r in rows
        ],
        np.uint64,
    )


def mutate_doc(rng, rows, d):
    """Partial edit of an existing doc: point edits + optional insert or
    delete (shifts every later line, like a real file edit)."""
    m = rows.copy()
    for _ in range(int(rng.integers(1, max(2, len(m) // 4)))):
        m[int(rng.integers(0, len(m)))] = make_rows(rng, 1, d)[0]
    r = rng.random()
    if r < 0.3:
        at = int(rng.integers(0, len(m) + 1))
        m = np.concatenate([m[:at], make_rows(rng, 1, d), m[at:]])
    elif r < 0.5 and len(m) > 1:
        at = int(rng.integers(0, len(m)))
        m = np.concatenate([m[:at], m[at + 1:]])
    return m


def check_rows(got, dist, owner, order, t):
    """Tie-aware: positionwise distances agree (f32-path tolerance) and
    every returned hit's reported distance is its true distance."""
    if len(got) != len(order):
        return False
    for r, j in zip(got, order):
        if abs(r.distance - float(dist[j])) > 3e-4:
            return False
        jj = owner.index((r.path, r.line_number))
        if abs(float(dist[jj]) - r.distance) > 3e-4:
            return False
        if t is not None and not (r.distance < t + 3e-4):
            return False
    return True


def soak_store(steps, seeds):
    from semtools_tpu.store import device_cache
    from semtools_tpu.store.store import Store

    fails = checks = 0
    for seed, tier, d in itertools.product(range(seeds), TIERS, (13, 16)):
        for k in CLEAR:
            os.environ.pop(k, None)
        os.environ.update(tier)
        device_cache.invalidate()
        rng = np.random.default_rng(7000 + seed)
        s = Store(tempfile.mkdtemp() + "/ws", dim=d)
        model = {}
        paths = [f"/doc{i}.txt" for i in range(6)]
        for step in range(steps):
            op = rng.random()
            p = paths[int(rng.integers(0, len(paths)))]
            if op < 0.5:
                if p in model and rng.random() < 0.5:
                    m = mutate_doc(rng, model[p], d)
                else:
                    m = make_rows(rng, int(rng.integers(1, 50)), d)
                s.upsert_document_lines(p, m, content_hashes(m))
                model[p] = m
                if tier.get("SEMTOOLS_TPU_FORCE_ANN") and rng.random() < 0.7:
                    # 30% of writes leave the index stale: queries must
                    # detect the generation mismatch and fall through
                    s.build_ann_index(force=True)
            elif op < 0.65 and model:
                victim = list(model)[int(rng.integers(0, len(model)))]
                s.delete_line_embeddings([victim])
                del model[victim]
            elif op < 0.7:
                # Vacuum mid-churn: rows move, free table empties, a fresh
                # ANN index remaps in place, a stale one must retire —
                # subsequent checks validate every tier over the moved rows.
                s.compact()
            elif model:
                keys = sorted(model)
                if rng.random() < 0.5 and len(keys) > 1:
                    # Path-subset query: exercises the masked device
                    # serving path (forced half the time so it also runs
                    # cold) against subset-restricted ground truth.
                    take = int(rng.integers(1, len(keys)))
                    keys = sorted(
                        rng.choice(keys, size=take, replace=False).tolist()
                    )
                    os.environ["SEMTOOLS_TPU_SUBSET_DEVICE"] = (
                        "1" if rng.random() < 0.5 else "auto"
                    )
                else:
                    os.environ.pop("SEMTOOLS_TPU_SUBSET_DEVICE", None)
                rows = np.concatenate([model[k2] for k2 in keys], axis=0)
                owner = [(k2, i) for k2 in keys for i in range(len(model[k2]))]
                top_k = int(rng.choice([1, 3, 70, len(owner) + 5]))
                t = float(rng.uniform(0.3, 1.6)) if rng.random() < 0.5 else None
                nq = int(rng.choice([1, 2, 40]))
                qrows = make_rows(rng, nq, d)
                per = s.search_line_embeddings_batched(qrows, keys, top_k, t)
                for r in range(nq):
                    dist = 1.0 - rows @ qrows[r]
                    order = np.argsort(dist, kind="stable")[:top_k]
                    if t is not None:
                        order = order[dist[order] < t]
                    checks += 1
                    if not check_rows(per[r], dist, owner, order, t):
                        fails += 1
                        print(f"STORE MISMATCH seed={seed} tier={tier} d={d} "
                              f"step={step} k={top_k} t={t} q={r}")
        s.close()
        # Per-campaign progress: a killed/timed-out run still leaves an
        # auditable record of how far it got and with how many checks.
        print(f"store campaign seed={seed} d={d} tier={tier or 'exact'}: "
              f"{checks} cumulative checks, {fails} failures", flush=True)
    return checks, fails


def soak_workspace(steps):
    os.environ["HOME"] = tempfile.mkdtemp()
    for k in CLEAR:
        os.environ.pop(k, None)
    from semtools_tpu.models.static_model import StaticModel
    from semtools_tpu.search import SearchConfig, search_with_workspace
    from semtools_tpu.store import Workspace, WorkspaceConfig
    from semtools_tpu.store.store import Store

    model = StaticModel.fallback()
    Workspace(WorkspaceConfig(name="fz", root_dir=Workspace.root_path("fz"))).save()
    root = tempfile.mkdtemp()
    WORDS = ["alpha", "beta", "gamma", "delta", "engine", "matrix", "tensor",
             "kernel", "fox", "jumps", "database", "index", "line", "search"]
    rng = np.random.default_rng(123)
    tick = [time.time()]

    def write(path, lines):
        path.write_text("\n".join(lines) + ("\n" if lines else ""))
        tick[0] += 11
        os.utime(path, (tick[0], tick[0]))

    def rand_line():
        return " ".join(rng.choice(WORDS, rng.integers(1, 8)).tolist())

    files = {}
    fails = checks = 0
    for step in range(steps):
        op = rng.random()
        p = Path(root) / f"f{int(rng.integers(0, 5))}.txt"
        if op < 0.35 or not files:
            lines = [rand_line() for _ in range(int(rng.integers(1, 30)))]
            write(p, lines)
            files[str(p)] = lines
        elif op < 0.55 and str(p) in files:
            lines = files[str(p)]
            r2 = rng.random()
            if r2 < 0.4 and lines:
                lines[int(rng.integers(0, len(lines)))] = rand_line()
            elif r2 < 0.7:
                lines.insert(int(rng.integers(0, len(lines) + 1)), rand_line())
            elif len(lines) > 1:
                lines.pop(int(rng.integers(0, len(lines))))
            write(p, lines)
        elif op < 0.65 and str(p) in files:
            p.unlink()
            del files[str(p)]
            with Store(Workspace.root_path("fz"), dim=model.dim) as s:
                s.delete_documents([str(p)])
        else:
            if not files:
                continue
            q = rand_line()
            cfg = SearchConfig(
                top_k=int(rng.integers(1, 5)), n_lines=0,
                ignore_case=bool(rng.random() < 0.3),
                max_distance=float(rng.uniform(0.4, 1.2))
                if rng.random() < 0.4 else None,
            )
            paths = sorted(files)
            qq = q.lower() if cfg.ignore_case else q
            got = search_with_workspace(paths, qq, model, cfg, "fz")
            all_lines, owner = [], []
            for pp in paths:
                for i, ln in enumerate(files[pp]):
                    all_lines.append(ln.lower() if cfg.ignore_case else ln)
                    owner.append((pp, i))
            emb = np.asarray(model.encode(all_lines, max_length=2048))
            qe = np.asarray(model.encode_single(qq))
            dist = 1.0 - emb @ qe
            order = np.argsort(dist, kind="stable")[:cfg.top_k]
            if cfg.max_distance is not None:
                order = order[dist[order] < cfg.max_distance]
            checks += 1
            ok = len(got) == len(order) and all(
                abs(r.distance - float(dist[j])) < 3e-4
                for r, j in zip(got, order)
            )
            if not ok:
                fails += 1
                print(f"WORKSPACE MISMATCH step={step} cfg={cfg}")
    return checks, fails


def soak_daemon(steps):
    """Daemon-forwarded commands racing direct-CLI writer processes.

    Three processes touch one workspace: the resident daemon (serving
    forwarded searches from its device cache), direct-CLI writer
    subprocesses (SEMTOOLS_TPU_DAEMON=off — they embed changed files and
    mutate the store under the flock themselves), and this soak process
    (ground truth). Forwarded searches fired WHILE a writer runs must
    complete without error (transient staleness is allowed); once
    quiescent, a forwarded search must match ground truth recomputed from
    file contents — the daemon's generation-keyed device cache has to
    pick up every cross-process mutation.
    """
    import json as _json
    import socket as _socket
    import subprocess

    home = tempfile.mkdtemp()
    dmn_dir = tempfile.mkdtemp()
    env = dict(os.environ)
    for k in CLEAR:
        env.pop(k, None)
    env.update(
        HOME=home,
        SEMTOOLS_TPU_PLATFORM="cpu",
        JAX_PLATFORMS="cpu",
        SEMTOOLS_TPU_DAEMON_DIR=dmn_dir,
        SEMTOOLS_WORKSPACE="dz",
        SEMTOOLS_TPU_NO_FETCH="1",
        SEMTOOLS_TPU_ALLOW_FALLBACK="1",
    )

    def run_cli(argv, extra_env=None, wait=True):
        e = dict(env)
        if extra_env:
            e.update(extra_env)
        p = subprocess.Popen(
            [sys.executable, "-m", "semtools_tpu.cli"] + argv,
            env=e, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        if not wait:
            return p
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, (argv, err)
        return out

    run_cli(["workspace", "use", "dz"])
    daemon = subprocess.Popen(
        [sys.executable, "-m", "semtools_tpu.cli", "daemon", "run"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    sock = Path(dmn_dir) / "daemon.sock"
    for _ in range(240):
        if sock.exists():
            break
        time.sleep(0.5)
    assert sock.exists(), "daemon never came up"

    fwd_env = {
        k: v for k, v in env.items()
        if k.startswith("SEMTOOLS_")
        and k not in ("SEMTOOLS_TPU_DAEMON", "SEMTOOLS_TPU_DAEMON_DIR")
    }
    fwd_env["HOME"] = home

    def forwarded(argv):
        payload = {"argv": argv, "stdin": None, "cwd": home, "env": fwd_env}
        with _socket.socket(_socket.AF_UNIX) as s:
            s.settimeout(600)
            s.connect(str(sock))
            s.sendall(_json.dumps(payload).encode() + b"\n")
            buf = b""
            while not buf.endswith(b"\n"):
                c = s.recv(1 << 20)
                if not c:
                    break
                buf += c
        return _json.loads(buf)

    from semtools_tpu.models.static_model import StaticModel

    model = StaticModel.fallback()  # deterministic across processes
    WORDS = ["alpha", "beta", "gamma", "delta", "engine", "matrix",
             "tensor", "kernel", "fox", "jumps", "database", "index"]
    rng = np.random.default_rng(321)
    tick = [time.time()]
    root = tempfile.mkdtemp()
    files = {}

    def write(path, lines):
        path.write_text("\n".join(lines) + ("\n" if lines else ""))
        tick[0] += 11
        os.utime(path, (tick[0], tick[0]))

    def rand_line():
        return " ".join(rng.choice(WORDS, rng.integers(1, 7)).tolist())

    fails = checks = 0
    try:
        for step in range(steps):
            # mutate 1-3 files
            for _ in range(int(rng.integers(1, 4))):
                p = Path(root) / f"f{int(rng.integers(0, 5))}.txt"
                lines = [rand_line() for _ in range(int(rng.integers(1, 25)))]
                write(p, lines)
                files[str(p)] = lines
            paths = sorted(files)
            q = rand_line()
            # direct-CLI writer (embeds the changes, mutates the store)
            writer = run_cli(
                ["search", q, *paths, "-n", "0"],
                extra_env={"SEMTOOLS_TPU_DAEMON": "off"}, wait=False,
            )
            # forwarded reads racing the writer: must not error
            for _ in range(2):
                resp = forwarded(["search", rand_line(), *paths, "-n", "0", "-j"])
                assert resp.get("exit") == 0, resp.get("stderr")
            out, err = writer.communicate(timeout=600)
            assert writer.returncode == 0, err
            if rng.random() < 0.3:
                # direct-CLI vacuum: rows move on disk + generation bumps
                # in another process; the daemon's warm corpus must pick
                # it up before the quiescent check below
                run_cli(
                    ["workspace", "compact"],
                    extra_env={"SEMTOOLS_TPU_DAEMON": "off"},
                )
            # quiescent: forwarded search (it performs any pending update
            # itself) must match ground truth from file contents
            q2 = rand_line()
            resp = forwarded(
                ["search", q2, *paths, "-n", "0", "--top-k", "3", "-j"]
            )
            assert resp.get("exit") == 0, resp.get("stderr")
            got = _json.loads(resp["stdout"])["results"]
            all_lines, owner = [], []
            for pp in paths:
                for i, ln in enumerate(files[pp]):
                    all_lines.append(ln)
                    owner.append((pp, i))
            emb = np.asarray(model.encode(all_lines, max_length=2048))
            qe = np.asarray(model.encode_single(q2))
            dist = 1.0 - emb @ qe
            order = np.argsort(dist, kind="stable")[:3]
            checks += 1
            ok = len(got) == len(order) and all(
                abs(r["distance"] - float(dist[j])) < 3e-4
                for r, j in zip(got, order)
            )
            if not ok:
                fails += 1
                print(f"DAEMON MISMATCH step={step} q={q2!r}")
    finally:
        with contextlib_suppress():
            forwarded_stop = {"op": "stop"}
            with _socket.socket(_socket.AF_UNIX) as s:
                s.settimeout(10)
                s.connect(str(sock))
                s.sendall(_json.dumps(forwarded_stop).encode() + b"\n")
                s.recv(1 << 16)
        try:
            daemon.wait(timeout=15)
        except subprocess.TimeoutExpired:
            daemon.kill()
    return checks, fails


def contextlib_suppress():
    import contextlib

    return contextlib.suppress(Exception)


def soak_crash(rounds):
    """SIGKILL crash-injection: every deterministic phase trap plus
    randomized timer kills (tests/crash_harness.py).  Each round kills a
    child mutator and verifies the reopened store's copy-on-write
    contract end-to-end (atomic per-doc state, sidecar agreement,
    disjoint ranges, exact search, writability)."""
    from tests import crash_harness as ch

    fails = checks = 0
    rng = np.random.default_rng(424242)
    phases = sorted(ch.PHASES)
    for r in range(rounds):
        # Even rounds walk the deterministic traps IN ORDER (r//2 so the
        # rotation covers all of them, not just even indices); odd
        # rounds kill at a random instant.
        phase = phases[(r // 2) % len(phases)] if r % 2 == 0 else None
        kill_after = float(rng.uniform(0.05, 1.2))
        with tempfile.TemporaryDirectory() as td:
            try:
                checks += ch.run_round(
                    td, seed=1000 + r, phase=phase,
                    steps=int(rng.integers(4, 25)), kill_after=kill_after,
                )
            except ch.CrashVerifyError as e:
                fails += 1
                print(f"CRASH SOAK FAILURE round={r} phase={phase} "
                      f"kill_after={kill_after:.2f}: {e}")
    return checks, fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--crash-rounds", type=int, default=None,
                    help="SIGKILL crash-injection rounds (default steps//2)")
    args = ap.parse_args()

    c1, f1 = soak_store(args.steps, args.seeds)
    c2, f2 = soak_workspace(args.steps)
    c3, f3 = soak_daemon(min(args.steps, 12))
    rounds = args.crash_rounds if args.crash_rounds is not None else max(8, args.steps // 2)
    c4, f4 = soak_crash(rounds)
    print(f"store soak: {c1} checks, {f1} failures")
    print(f"workspace soak: {c2} checks, {f2} failures")
    print(f"daemon soak: {c3} checks, {f3} failures")
    print(f"crash soak: {c4} checks, {f4} failures ({rounds} kills)")
    sys.exit(1 if (f1 or f2 or f3 or f4) else 0)


if __name__ == "__main__":
    main()
