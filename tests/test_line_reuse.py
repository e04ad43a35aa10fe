"""Line-level embedding reuse on file edits (the lines.h64 sidecar)."""

from __future__ import annotations

import numpy as np
import pytest

from semtools_tpu.search import SearchConfig, search_with_workspace
from semtools_tpu.store import Workspace, WorkspaceConfig
from semtools_tpu.store.store import Store


@pytest.fixture()
def ws(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    name = "reuse"
    Workspace(WorkspaceConfig(name=name, root_dir=Workspace.root_path(name))).save()
    return name, tmp_path


class _CountingModel:
    """Wraps the fallback model, counting how many lines get encoded."""

    def __init__(self, inner):
        self._inner = inner
        self.encoded_lines = 0

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def encode(self, texts, *a, **kw):
        self.encoded_lines += len(texts)
        return self._inner.encode(texts, *a, **kw)


def _bump_mtime(path):
    import os

    st = path.stat()
    os.utime(path, (st.st_atime, st.st_mtime + 5))


def test_one_line_edit_embeds_one_line(ws, fallback_model, capsys):
    name, tmp = ws
    model = _CountingModel(fallback_model)
    f = tmp / "doc.txt"
    lines = [f"stable content line number {i}" for i in range(200)]
    f.write_text("\n".join(lines) + "\n")
    cfg = SearchConfig(top_k=3, n_lines=0)

    search_with_workspace([str(f)], "content", model, cfg, name)
    assert model.encoded_lines >= 200  # cold build embeds everything

    lines[57] = "a freshly edited line"
    f.write_text("\n".join(lines) + "\n")
    _bump_mtime(f)
    model.encoded_lines = 0
    hits = search_with_workspace([str(f)], "freshly edited", model, cfg, name)
    # one novel line + the query itself
    assert model.encoded_lines <= 2
    assert (hits[0].path, hits[0].line_number) == (str(f), 57)
    err = capsys.readouterr().err
    assert "reused 199 cached line embeddings" in err
    assert "embedded 1 unique new lines" in err


def test_reused_rows_identical_to_full_reembed(ws, fallback_model):
    name, tmp = ws
    f = tmp / "doc.txt"
    lines = [f"alpha {i}" for i in range(50)]
    f.write_text("\n".join(lines) + "\n")
    cfg = SearchConfig(top_k=1, n_lines=0)
    search_with_workspace([str(f)], "alpha", fallback_model, cfg, name)

    lines.insert(10, "inserted brand new line")  # shifts every later line
    f.write_text("\n".join(lines) + "\n")
    _bump_mtime(f)
    search_with_workspace([str(f)], "alpha", fallback_model, cfg, name)

    ws_dir = Workspace.root_path(name)
    with Store(ws_dir, dim=fallback_model.dim) as s:
        corpus, paths, line_nos = s.load_subset_matrix([str(f)])
    want = np.asarray(
        fallback_model.encode(lines, max_length=2048), np.float32
    )
    order = np.argsort(line_nos)
    np.testing.assert_allclose(corpus[order], want, atol=1e-5)


def test_version_mismatch_disables_reuse(ws, fallback_model, monkeypatch):
    # a model change marks stored docs version=-1; their rows must NOT be
    # reused even when line hashes match
    name, tmp = ws
    f = tmp / "doc.txt"
    f.write_text("line one\nline two\n")
    cfg = SearchConfig(top_k=1, n_lines=0)
    search_with_workspace([str(f)], "one", fallback_model, cfg, name)

    ws_dir = Workspace.root_path(name)
    with Store(ws_dir, dim=fallback_model.dim) as s:
        s.db.execute("UPDATE docs SET version = -1")
        s.db.commit()

    model = _CountingModel(fallback_model)
    search_with_workspace([str(f)], "one", model, cfg, name)
    assert model.encoded_lines >= 2  # both lines re-embedded


def test_ignore_case_hashes_folded_text(ws, fallback_model):
    name, tmp = ws
    f = tmp / "doc.txt"
    f.write_text("MiXeD Case LINE\nother line\n")
    cfg = SearchConfig(top_k=1, n_lines=0, ignore_case=True)
    search_with_workspace([str(f)], "mixed", fallback_model, cfg, name)

    # same folded content, different raw case: hash matches -> reuse
    f.write_text("mixed case line\nother line\nadded line\n")
    _bump_mtime(f)
    model = _CountingModel(fallback_model)
    hits = search_with_workspace([str(f)], "added", model, cfg, name)
    assert model.encoded_lines <= 2  # "added line" + query only
    assert hits[0].line_number == 2


def test_duplicate_novel_lines_embed_once(ws, fallback_model):
    name, tmp = ws
    model = _CountingModel(fallback_model)
    f1 = tmp / "a.txt"
    f2 = tmp / "b.txt"
    f1.write_text("shared boilerplate\nshared boilerplate\nuniq a\n")
    f2.write_text("shared boilerplate\nuniq b\n")
    cfg = SearchConfig(top_k=1, n_lines=0)
    search_with_workspace([str(f1), str(f2)], "uniq", model, cfg, name)
    # 3 unique lines across both docs + 1 query
    assert model.encoded_lines <= 4


def test_sidecar_survives_reopen_and_store_api(tmp_path, rng):
    s = Store(str(tmp_path / "ws"), dim=8)
    rows = rng.standard_normal((4, 8)).astype(np.float32)
    hashes = np.array([11, 22, 33, 44], np.uint64)
    s.upsert_document_lines("/d.txt", rows, hashes)
    s.close()
    s = Store(str(tmp_path / "ws"), dim=8)
    got = s.get_doc_hash_rows("/d.txt")
    assert got is not None
    np.testing.assert_array_equal(got[0], hashes)
    np.testing.assert_allclose(got[1], rows, atol=0)
    # rows written without hashes read back as zeros (never reused)
    s.upsert_document_lines("/e.txt", rows)
    got_e = s.get_doc_hash_rows("/e.txt")
    assert got_e is not None
    np.testing.assert_array_equal(got_e[0], np.zeros(4, np.uint64))
    s.close()


def test_old_store_without_sidecar_degrades_gracefully(tmp_path, rng):
    s = Store(str(tmp_path / "ws"), dim=8)
    rows = rng.standard_normal((3, 8)).astype(np.float32)
    s.upsert_document_lines("/d.txt", rows, np.array([1, 2, 3], np.uint64))
    # simulate a pre-sidecar store
    s.hash_path.unlink()
    assert s.get_doc_hash_rows("/d.txt") is None
    # upserts keep working and recreate the sidecar at full capacity
    s.upsert_document_lines("/d.txt", rows, np.array([4, 5, 6], np.uint64))
    got = s.get_doc_hash_rows("/d.txt")
    assert got is not None and got[0].tolist() == [4, 5, 6]
    s.close()
