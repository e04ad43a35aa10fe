"""SIGKILL crash-safety: the store's copy-on-write contract under real
process kills.

Each phase test arms a trap that ``os._exit``'s a child mutator at one
precise point inside a write path (tests/crash_harness.py), then
verifies the re-opened store: per-document atomicity (bytes equal the
committed OR the in-flight state, never a mix), vec/hash sidecar
agreement, disjoint in-bounds live ranges, brute-force-equal search, and
continued writability.  The timer test adds a few random-instant kills
on top of the deterministic points.

The contract under test is the one the reference inherits from
qdrant-edge's mmap + WAL storage (/root/reference/src/workspace/
store.rs:128-170) and our store documents in
``Store.upsert_documents_bulk`` / ``Store.compact``.
"""

import os

import pytest

from tests import crash_harness as ch

pytestmark = pytest.mark.skipif(
    os.name != "posix", reason="SIGKILL crash injection is POSIX-only"
)


@pytest.mark.parametrize("phase", sorted(ch.PHASES))
def test_phase_kill(tmp_path, phase):
    # crc32, not hash(): Python's string hash is per-process randomized,
    # which would make the warmup op sequence unreproducible across runs.
    import zlib

    seed = zlib.crc32(phase.encode()) % 1000
    checks = ch.run_round(str(tmp_path), seed=seed, phase=phase)
    assert checks > 0


@pytest.mark.parametrize("seed,delay", [(1, 0.15), (2, 0.45), (3, 0.9)])
def test_timer_kill(tmp_path, seed, delay):
    checks = ch.run_round(
        str(tmp_path), seed=seed, phase=None, kill_after=delay
    )
    assert checks > 0


def test_verifier_detects_torn_write(tmp_path):
    """A verifier that cannot fail proves nothing: flip one byte inside
    a committed document's vectors and the digest check must trip."""
    import json

    import numpy as np

    from semtools_tpu.store.store import Store

    store_dir, journal = tmp_path / "ws", tmp_path / "j.jsonl"
    rng = np.random.default_rng(5)
    rows = ch.make_rows(rng, 10)
    with Store(str(store_dir), dim=ch.DIM) as s:
        s.upsert_document_lines("/a.txt", rows, ch.content_hashes(rows))
    rec = {"op": "upsert", "path": "/a.txt", "digest": ch.digest(rows)}
    journal.write_text(
        json.dumps({**rec, "phase": "begin"})
        + "\n"
        + json.dumps({**rec, "phase": "done"})
        + "\n"
    )
    vec = store_dir / "lines.f32"
    data = bytearray(vec.read_bytes())
    data[3] ^= 0xFF
    vec.write_bytes(data)
    with pytest.raises(ch.CrashVerifyError, match="torn write"):
        ch.verify(str(store_dir), str(journal))
