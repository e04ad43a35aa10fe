"""Workspace compaction: slot-space vacuum + in-place ANN index remap.

The free-range allocator reuses holes, but churn leaves capacity > live
rows, and every capacity-shaped cost (device corpus, scan length, LRU
budget) is paid on capacity. ``Store.compact`` densifies slot space; a
FRESH IVF-PQ index survives via slot remap (its row content is
untouched), a stale one is retired by the drift bound. The reference's
qdrant-edge covers this with its background optimizer.
"""

import numpy as np
import pytest

from semtools_tpu.store import Store


@pytest.fixture()
def rng():
    return np.random.default_rng(11)


def _unit(rng, n, d=16):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _fill(store, rng, docs=8, rows=20, d=16):
    model = {}
    for i in range(docs):
        x = _unit(rng, rows, d=d)
        store.upsert_document_lines(f"/d{i}.txt", x)
        model[f"/d{i}.txt"] = x
    return model


def _fragment(store, model, rng, d=16):
    """Delete some docs and rewrite others at different sizes — classic
    churn that leaves holes the best-fit allocator can't fully reuse."""
    store.delete_documents(["/d1.txt", "/d4.txt"])
    del model["/d1.txt"], model["/d4.txt"]
    for name, n in (("/d2.txt", 33), ("/d6.txt", 7), ("/d0.txt", 29)):
        x = _unit(rng, n, d=d)
        store.upsert_document_lines(name, x)
        model[name] = x
    return model


def _check_search(store, model, rng, d=16, top_k=10):
    keys = sorted(model)
    rows = np.concatenate([model[k] for k in keys])
    q = _unit(rng, 1, d=d)[0]
    got = store.search_line_embeddings(q, keys, top_k)
    dist = 1.0 - rows @ q
    order = np.argsort(dist, kind="stable")[:top_k]
    assert len(got) == len(order)
    for g, j in zip(got, order):
        assert abs(g.distance - float(dist[j])) < 3e-4


class TestCompact:
    def test_reclaims_and_preserves_content(self, tmp_path, rng):
        s = Store(str(tmp_path / "ws"), dim=16)
        model = _fill(s, rng)
        model = _fragment(s, model, rng)
        live, cap = s.fragmentation()
        assert cap > live  # churn left holes
        before = {
            p: np.array(s.get_doc_hash_rows(p)[1]) for p in model
        }
        report = s.compact()
        assert report["rows_live"] == live
        assert report["slots_reclaimed"] == cap - live
        live2, cap2 = s.fragmentation()
        assert live2 == cap2 == live  # dense now
        # every document's rows are byte-identical after the moves
        for p in model:
            np.testing.assert_array_equal(
                np.array(s.get_doc_hash_rows(p)[1]), before[p]
            )
        _check_search(s, model, rng)
        s.close()

    def test_idempotent(self, tmp_path, rng):
        s = Store(str(tmp_path / "ws"), dim=16)
        model = _fill(s, rng)
        model = _fragment(s, model, rng)
        gen_after_first = None
        assert s.compact()["slots_reclaimed"] > 0
        gen_after_first = s.generation()
        second = s.compact()
        assert second["slots_reclaimed"] == 0
        # the no-op fast path must not bump the generation (device caches
        # and the ANN index key on it)
        assert s.generation() == gen_after_first
        s.close()

    def test_empty_store(self, tmp_path):
        s = Store(str(tmp_path / "ws"), dim=16)
        report = s.compact()
        assert report == {
            "rows_live": 0, "slots_before": 0,
            "slots_reclaimed": 0, "index_remapped": False,
        }
        s.close()

    def test_crash_before_swap_leaves_old_state(self, tmp_path, rng, monkeypatch):
        """Kill the compact after the new epoch's files are written but
        before the swap transaction commits: reopening must serve the
        OLD state intact (copy-on-write contract), and the next compact
        must clean the orphan files and succeed."""
        s = Store(str(tmp_path / "ws"), dim=16)
        model = _fill(s, rng)
        model = _fragment(s, model, rng)
        before = {p: np.array(s.get_doc_hash_rows(p)[1]) for p in model}
        gen_before = s.generation()

        def crash():
            raise RuntimeError("simulated crash before commit")

        # _bump_generation runs inside the swap transaction, after the
        # new-epoch files and the slot_start UPDATEs, before commit
        monkeypatch.setattr(s, "_bump_generation", crash)
        with pytest.raises(RuntimeError):
            s.compact()
        s.close()  # uncommitted transaction rolls back

        s2 = Store(str(tmp_path / "ws"), dim=16)
        assert s2.generation() == gen_before
        assert s2._vec_epoch() == 0
        assert (tmp_path / "ws" / "lines.e1.f32").exists()  # orphan
        for p in model:
            np.testing.assert_array_equal(
                np.array(s2.get_doc_hash_rows(p)[1]), before[p]
            )
        _check_search(s2, model, rng)
        report = s2.compact()
        assert report["slots_reclaimed"] > 0
        assert s2._vec_epoch() == 1
        # lines.e1.f32 is now the LIVE epoch, freshly rewritten: its size
        # must match the live rows, not the crashed attempt's leftover
        live, cap = s2.fragmentation()
        assert (tmp_path / "ws" / "lines.e1.f32").stat().st_size == live * 4 * 16
        assert not (tmp_path / "ws" / "lines.f32").exists()  # epoch 0 retired
        _check_search(s2, model, rng)
        s2.close()

    def test_open_reader_mmap_survives_compact(self, tmp_path, rng):
        """A lock-free reader holding the pre-compact mmap keeps a frozen
        consistent snapshot: the superseded epoch is never mutated, only
        unlinked (POSIX keeps the mapping alive)."""
        s = Store(str(tmp_path / "ws"), dim=16)
        model = _fill(s, rng)
        model = _fragment(s, model, rng)
        reader = Store(str(tmp_path / "ws"), dim=16)
        ranges = {p: (st, n) for p, st, n in reader._valid_ranges()}
        mm = reader._mmap("r")
        pre = {p: np.array(mm[st : st + n]) for p, (st, n) in ranges.items()}
        assert s.compact()["slots_reclaimed"] > 0
        # the old mapping still reads the ORIGINAL rows at the OLD slots
        for p, (st, n) in ranges.items():
            np.testing.assert_array_equal(np.array(mm[st : st + n]), pre[p])
        del mm
        # and a fresh query on the reader serves the post-compact state
        _check_search(reader, model, rng)
        reader.close()
        s.close()

    def test_stale_snapshot_retry(self, tmp_path, rng):
        """The razor window: a reader whose cached layout predates a
        concurrent compact gathers stale slots against the new (smaller)
        epoch. The search funnel must retry with fresh state instead of
        erroring or returning wrong rows."""
        s = Store(str(tmp_path / "ws"), dim=16)
        model = _fill(s, rng)
        model = _fragment(s, model, rng)
        reader = Store(str(tmp_path / "ws"), dim=16)
        _check_search(reader, model, rng)  # warm the reader's caches
        stale_ranges = reader._valid_ranges_cached()
        assert s.compact()["slots_reclaimed"] > 0
        # simulate losing the race: pin the PRE-compact layout under the
        # POST-compact generation so the gen-keyed cache can't heal it
        reader._ranges_cache = (reader.generation(), stale_ranges)
        _check_search(reader, model, rng)
        reader.close()
        s.close()

    def test_retired_epoch_faults_instead_of_silently_repointing(
        self, tmp_path, rng
    ):
        """A reader whose pinned epoch file was retired must FAULT, not
        silently re-point to the new epoch: stale slots below the new
        live-row count would gather the WRONG rows with no exception,
        and the funnel retry only heals faults (review finding — the old
        _capacity self-heal paired pre-compact slots with the
        post-compact dense file)."""
        import pytest as _pytest

        s = Store(str(tmp_path / "ws"), dim=16)
        model = _fill(s, rng)
        model = _fragment(s, model, rng)
        reader = Store(str(tmp_path / "ws"), dim=16)
        _check_search(reader, model, rng)  # pins ranges + epoch path
        stale_ranges = reader._valid_ranges_cached()
        assert s.compact()["slots_reclaimed"] > 0
        # lose the race: stale layout pinned under the current generation
        reader._ranges_cache = (reader.generation(), stale_ranges)
        with _pytest.raises(FileNotFoundError):
            reader._mmap("r")  # pinned stat faults — never wrong rows
        _check_search(reader, model, rng)  # the funnel retry heals
        reader.close()
        s.close()

    def test_subset_search_consistent_across_compact(self, tmp_path, rng):
        """Path-subset queries read their slots from the same atomically
        paired (generation, ranges, epoch) snapshot as full-store
        queries — a compact landing between a separate subset read and
        the epoch refresh used to pair pre-compact slots with the
        post-compact file (review finding)."""
        s = Store(str(tmp_path / "ws"), dim=16)
        model = _fill(s, rng)
        model = _fragment(s, model, rng)
        reader = Store(str(tmp_path / "ws"), dim=16)
        subset = sorted(model)[:3]
        q = _unit(rng, 1, d=16)[0]

        def expected():
            rows = np.concatenate([model[k] for k in subset])
            dist = 1.0 - rows @ q
            return np.sort(dist)[:5]

        got = reader.search_line_embeddings(q, subset, 5)
        np.testing.assert_allclose(
            [g.distance for g in got], expected(), atol=3e-4
        )
        assert s.compact()["slots_reclaimed"] > 0
        got = reader.search_line_embeddings(q, subset, 5)
        np.testing.assert_allclose(
            [g.distance for g in got], expected(), atol=3e-4
        )
        reader.close()
        s.close()

    def test_orphan_epoch_files_cleaned(self, tmp_path, rng):
        s = Store(str(tmp_path / "ws"), dim=16)
        model = _fill(s, rng)
        model = _fragment(s, model, rng)
        for name in ("lines.e5.f32", "lines.e5.h64"):
            (tmp_path / "ws" / name).write_bytes(b"junk")
        s.compact()
        assert not (tmp_path / "ws" / "lines.e5.f32").exists()
        assert not (tmp_path / "ws" / "lines.e5.h64").exists()
        assert not (tmp_path / "ws" / "lines.f32").exists()  # epoch retired
        assert (tmp_path / "ws" / "lines.e1.f32").exists()
        _check_search(s, model, rng)
        s.close()

    def test_survives_reopen(self, tmp_path, rng):
        s = Store(str(tmp_path / "ws"), dim=16)
        model = _fill(s, rng)
        model = _fragment(s, model, rng)
        s.compact()
        s.close()
        s2 = Store(str(tmp_path / "ws"), dim=16)
        _check_search(s2, model, rng)
        s2.close()

    def test_hash_sidecar_moves_with_rows(self, tmp_path, rng):
        """Line-reuse hashes must track their rows or reuse would copy
        the wrong vectors after compaction."""
        s = Store(str(tmp_path / "ws"), dim=16)
        x = _unit(rng, 5)
        hashes = np.arange(1, 6, dtype=np.uint64) * 1000
        s.upsert_document_lines("/a.txt", _unit(rng, 40))
        s.upsert_document_lines("/h.txt", x, line_hashes=hashes)
        s.delete_documents(["/a.txt"])
        s.compact()
        got_h, got_rows = s.get_doc_hash_rows("/h.txt")
        np.testing.assert_array_equal(got_h, hashes)
        np.testing.assert_allclose(got_rows, x, atol=0)
        s.close()


class TestCompactAnn:
    def _mk(self, tmp_path, rng, monkeypatch):
        monkeypatch.setenv("SEMTOOLS_TPU_FORCE_ANN", "1")
        s = Store(str(tmp_path / "ws"), dim=16)
        model = _fill(s, rng, docs=6, rows=40)
        return s, model

    def test_fresh_index_remapped_in_place(self, tmp_path, rng, monkeypatch):
        s, model = self._mk(tmp_path, rng, monkeypatch)
        s.delete_documents(["/d2.txt"])
        del model["/d2.txt"]
        s.build_ann_index(force=True)  # fresh AFTER the delete
        assert s.serving_tier() == "ivf-pq"
        report = s.compact()
        assert report["slots_reclaimed"] == 40
        assert report["index_remapped"] is True
        # still serving, no rebuild, results match brute force
        assert s.serving_tier() == "ivf-pq"
        _check_search(s, model, rng)
        # remapped index still reconciles future mutations incrementally
        x = _unit(rng, 25)
        s.upsert_document_lines("/new.txt", x)
        model["/new.txt"] = x
        assert s.serving_tier() == "ivf-pq"
        got = s.search_line_embeddings(x[7], sorted(model), 1)
        assert (got[0].path, got[0].line_number) == ("/new.txt", 7)
        s.close()

    def test_stale_index_retired_not_corrupted(self, tmp_path, rng, monkeypatch):
        s, model = self._mk(tmp_path, rng, monkeypatch)
        s.build_ann_index(force=True)
        # mutate AFTER the build: index is stale (serving through delta),
        # then compact moves rows — the build layout no longer matches,
        # so the tier must step aside, never serve wrong slots
        s.delete_documents(["/d3.txt"])
        del model["/d3.txt"]
        report = s.compact()
        assert report["index_remapped"] is False
        assert s.serving_tier() != "ivf-pq"
        _check_search(s, model, rng)  # exact tiers serve correctly
        s.close()


def test_warm_device_corpus_reconciles_compaction_cheaply(tmp_path, monkeypatch):
    """After compact, the warm slot corpus must reconcile by MOVING
    surviving rows device-side (hash-matched), not re-uploading the
    corpus — compaction then costs O(holes) host->device bytes."""
    from semtools_tpu.store import device_cache, patch_cache

    monkeypatch.setenv("SEMTOOLS_TPU_SHARDED", "0")
    device_cache.invalidate()
    rng = np.random.default_rng(5)
    s = Store(str(tmp_path / "ws"), dim=32)
    docs = {}
    bulk = []
    for i in range(30):
        rows = _unit(rng, 100, d=32)
        hashes = (np.arange(100, dtype=np.uint64) + 1) * 7919 + i * 1_000_003
        bulk.append((f"/d{i:02}.txt", rows, hashes))
        docs[f"/d{i:02}.txt"] = rows
    s.upsert_documents_bulk(bulk)
    # punch a hole near the front so most docs move on compact
    s.delete_documents(["/d01.txt"])
    del docs["/d01.txt"]
    paths = sorted(docs)
    q = docs["/d07.txt"][42]
    hits = s.search_line_embeddings(q, paths, top_k=1)  # warm build
    assert (hits[0].path, hits[0].line_number) == ("/d07.txt", 42)
    built = patch_cache.uploaded_bytes()

    assert s.compact()["slots_reclaimed"] == 100
    hits = s.search_line_embeddings(q, paths, top_k=1)
    assert (hits[0].path, hits[0].line_number) == ("/d07.txt", 42)
    assert hits[0].distance < 1e-5
    shipped = patch_cache.uploaded_bytes() - built
    corpus_bytes = 2900 * 32 * 4
    # device-side moves: far below re-uploading the 28 moved documents
    assert shipped < corpus_bytes // 10, (shipped, corpus_bytes)
    _check_search(s, docs, rng, d=32)
    s.close()
    device_cache.invalidate()


def test_cli_compact_and_status_hint(tmp_path, monkeypatch, capsys):
    from semtools_tpu import cli

    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setenv("SEMTOOLS_WORKSPACE", "c")
    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON", "off")
    assert cli.main(["workspace", "use", "c"]) == 0
    capsys.readouterr()
    from semtools_tpu.store import Store, Workspace

    ws = Workspace.open("c")
    rng = np.random.default_rng(3)
    with Store(ws.config.root_dir, dim=16) as s:
        # >=1024 reclaimable slots so the status hint triggers
        s.upsert_document_lines("/big.txt", _unit(rng, 1500))
        s.upsert_document_lines("/keep.txt", _unit(rng, 64))
        s.delete_documents(["/big.txt"])
    assert cli.main(["workspace", "status"]) == 0
    out = capsys.readouterr().out
    assert "workspace compact" in out  # fragmentation hint shown
    assert cli.main(["workspace", "compact", "-j"]) == 0
    import json

    rep = json.loads(capsys.readouterr().out)
    assert rep["workspace"] == "c"
    assert rep["slots_reclaimed"] == 1500
    assert cli.main(["workspace", "status"]) == 0
    assert "workspace compact" not in capsys.readouterr().out
    # idempotent second run reports already-compact
    assert cli.main(["workspace", "compact"]) == 0
    assert "already compact" in capsys.readouterr().out
