"""Stage-timing instrumentation (semtools_tpu/utils/tracing.py)."""

from __future__ import annotations

import io

from semtools_tpu.utils import tracing


def test_disabled_by_default(monkeypatch):
    monkeypatch.delenv("SEMTOOLS_TPU_TIMINGS", raising=False)
    tracing.reset()
    with tracing.stage("x"):
        pass
    assert tracing.timings() == []


def test_records_and_reports(monkeypatch):
    monkeypatch.setenv("SEMTOOLS_TPU_TIMINGS", "1")
    tracing.reset()
    with tracing.stage("outer"):
        with tracing.stage("inner"):
            pass
    with tracing.stage("inner"):
        pass
    rows = dict((name, count) for name, _, count in tracing.timings())
    assert rows == {"outer": 1, "inner": 2}
    buf = io.StringIO()
    tracing.report(file=buf)
    out = buf.getvalue()
    assert "outer" in out and "x2" in out
    tracing.reset()


def test_search_emits_stages(monkeypatch, tmp_path):
    monkeypatch.setenv("SEMTOOLS_TPU_TIMINGS", "1")
    tracing.reset()
    p = tmp_path / "f.txt"
    p.write_text("alpha beta\ngamma delta\n")
    from semtools_tpu.models.static_model import StaticModel
    from semtools_tpu.search import SearchConfig, search_files

    model = StaticModel.fallback()
    search_files([str(p)], "alpha", model, SearchConfig(top_k=1))
    names = {name for name, _, _ in tracing.timings()}
    assert {"read_files", "embed", "scan"} <= names
    tracing.reset()
