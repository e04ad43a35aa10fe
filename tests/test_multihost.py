"""EXECUTED multi-host test: two real jax.distributed processes on this
machine form one global mesh and serve sharded scans + a workspace
search through the production bootstrap path (configure_jax ->
multihost.initialize from the standard coordinator env vars).

This is the DCN deployment shape run for real — not a simulation: each
process owns 4 CPU devices (gloo collectives), the corpus is row-sharded
across all 8, and per-device candidates merge with the same collectives
a TPU pod would route over ICI/DCN.
"""

from __future__ import annotations

import os
import pytest

pytestmark = pytest.mark.skipif(
    os.name != "posix", reason="gloo multihost bootstrap is POSIX-only here"
)

import json
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np

REPO = str(Path(__file__).resolve().parents[1])

_WORKER = textwrap.dedent("""
    import os, sys, json
    import numpy as np

    pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
    store_dir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["SEMTOOLS_TPU_PLATFORM"] = "cpu"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nprocs)
    os.environ["JAX_PROCESS_ID"] = str(pid)
    sys.path.insert(0, %(repo)r)

    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", 4)

    from semtools_tpu.utils.platform import configure_jax
    configure_jax()  # production bootstrap: joins the cluster from env

    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 4 * nprocs

    from semtools_tpu.ops.scan import threshold_scan, topk_scan
    from semtools_tpu.parallel.mesh import corpus_mesh, shard_corpus
    from semtools_tpu.parallel.scan import (
        sharded_threshold_scan, sharded_topk_scan_device,
    )

    mesh = corpus_mesh()
    rng = np.random.default_rng(123)
    n, d = 4096, 64
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = e[:2] + 0.01

    # 1. sharded top-k across both processes == single-device exact
    e_sharded, n_true = shard_corpus(e, mesh)
    dd, ii = sharded_topk_scan_device(q, e_sharded, n_true, 5, mesh)
    d_ref, i_ref = topk_scan(q, e, 5)
    np.testing.assert_array_equal(ii, i_ref)
    np.testing.assert_allclose(dd, d_ref, atol=1e-5)

    # 2. sharded threshold collection across processes
    d_t, i_t = sharded_threshold_scan(q[:1], e, 0.4, mesh)
    d_t1, i_t1 = threshold_scan(q[:1], e, 0.4)
    np.testing.assert_array_equal(i_t, i_t1)

    # 3. the PRODUCT path: a workspace store search served by the
    #    cross-process mesh (both processes read the same store files)
    from semtools_tpu.store import device_cache
    from semtools_tpu.store.store import Store

    os.environ["SEMTOOLS_TPU_SHARDED"] = "1"
    store = Store(store_dir, dim=d)
    paths = sorted({r[0] for r in store._valid_ranges_cached()})
    tier = store.serving_tier()
    assert tier.startswith("sharded-"), tier
    hits = store.search_line_embeddings(e[777], paths, top_k=3)
    assert (hits[0].path, hits[0].line_number) == ("/docA.txt", 777), hits[0]
    assert hits[0].distance < 1e-5

    # 4. masked path-subset query on the CROSS-PROCESS mesh: the mask
    #    is row-sharded with the corpus (device_put to the multihost
    #    sharding), results equal the compact reference
    os.environ["SEMTOOLS_TPU_SUBSET_DEVICE"] = "1"
    sub = store.search_line_embeddings(e[777], ["/docA.txt"], top_k=3)
    assert (sub[0].path, sub[0].line_number) == ("/docA.txt", 777), sub[0]
    os.environ["SEMTOOLS_TPU_SUBSET_DEVICE"] = "0"
    sub_ref = store.search_line_embeddings(e[777], ["/docA.txt"], top_k=3)
    assert [(h.path, h.line_number) for h in sub] == [
        (h.path, h.line_number) for h in sub_ref
    ]
    os.environ.pop("SEMTOOLS_TPU_SUBSET_DEVICE", None)

    os.environ["SEMTOOLS_TPU_SHARDED"] = "0"
    device_cache.invalidate()
    exact = store.search_line_embeddings(e[777], paths, top_k=3)
    assert [(h.path, h.line_number) for h in hits] == [
        (h.path, h.line_number) for h in exact
    ]
    store.close()

    print(json.dumps({"pid": pid, "devices": jax.device_count(),
                      "processes": jax.process_count(), "tier": tier,
                      "ok": True}))
""") % {"repo": REPO}


def test_two_process_mesh_serves_sharded_search(tmp_path):
    # Build the shared workspace store once, before the workers start.
    from semtools_tpu.store.store import Store

    rng = np.random.default_rng(123)
    n, d = 4096, 64
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    store_dir = str(tmp_path / "mh_ws")
    with Store(store_dir, dim=d) as s:
        s.upsert_documents_bulk(
            [("/docA.txt", e[: n // 2]), ("/docB.txt", e[n // 2 :])]
        )

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), store_dir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env={k: v for k, v in __import__("os").environ.items()
                 if not k.startswith(("JAX_", "XLA_"))},
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    for o in outs:
        assert o["ok"] and o["processes"] == 2 and o["devices"] == 8
        assert o["tier"].startswith("sharded-")
