"""Cross-process writer safety: concurrent upserts/deletes on one store.

Without the flock writer lock, two processes can interleave
_alloc_range's SELECT and DELETE, claim the same free range, and clobber
each other's mmap rows — this test runs real concurrent processes and
then verifies every document's stored vectors byte-for-byte.
"""

from __future__ import annotations

import subprocess
import sys

import numpy as np
import pytest

from semtools_tpu.store.store import Store

_WORKER = r"""
import sys
import numpy as np
from semtools_tpu.store.store import Store

ws_dir, worker_id, n_docs, dim = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])

def rows_for(w, d, dim):
    rng = np.random.default_rng(1000 * w + d)
    n = int(rng.integers(1, 20))
    x = rng.standard_normal((n, dim)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)

s = Store(ws_dir, dim=dim)
for d in range(n_docs):
    path = f"/w{worker_id}_d{d}.txt"
    s.upsert_document_lines(path, rows_for(worker_id, d, dim))
    if d % 3 == 0 and d > 0:
        # churn the allocator: delete and re-insert an earlier doc
        prev = f"/w{worker_id}_d{d-1}.txt"
        s.delete_line_embeddings([prev])
        s.upsert_document_lines(prev, rows_for(worker_id, d - 1, dim))
s.close()
"""


def _rows_for(w, d, dim):
    rng = np.random.default_rng(1000 * w + d)
    n = int(rng.integers(1, 20))
    x = rng.standard_normal((n, dim)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("n_workers,n_docs", [(4, 12)])
def test_concurrent_writers_do_not_clobber(tmp_path, n_workers, n_docs):
    ws = str(tmp_path / "ws")
    dim = 16
    Store(ws, dim=dim).close()  # create schema up front

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, ws, str(w), str(n_docs), str(dim)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for w in range(n_workers)
    ]
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()

    with Store(ws, dim=dim) as s:
        # every doc present with exactly its own vectors
        for w in range(n_workers):
            for d in range(n_docs):
                path = f"/w{w}_d{d}.txt"
                corpus, paths, line_nos = s.load_subset_matrix([path])
                want = _rows_for(w, d, dim)
                assert corpus.shape == want.shape, path
                order = np.argsort(line_nos)
                np.testing.assert_allclose(corpus[order], want, atol=1e-6,
                                           err_msg=path)
        # no two docs share slots
        ranges = s._valid_ranges()
        spans = sorted((start, start + n) for _, start, n in ranges)
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 <= b0, f"overlapping ranges {(a0, a1)} {(b0, b1)}"
        assert s.count_line_embeddings() == sum(
            len(_rows_for(w, d, dim))
            for w in range(n_workers) for d in range(n_docs)
        )


def test_write_lock_is_reentrant(tmp_path):
    s = Store(str(tmp_path / "ws"), dim=8)
    with s._write_lock():
        with s._write_lock():  # delete_documents nests the two delete ops
            assert s._lock_depth == 2
        assert s._lock_depth == 1
    assert s._lock_depth == 0
    s.close()
