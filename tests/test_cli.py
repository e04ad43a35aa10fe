"""End-to-end CLI tests (subprocess, real entry point).

The reference has no CLI-level tests (SURVEY.md §4) — a gap this suite
closes. Each test execs ``python -m semtools_tpu.cli`` with an isolated
HOME and the CPU platform pinned.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, stdin=None, home=None, env_extra=None):
    env = dict(os.environ)
    env["SEMTOOLS_TPU_PLATFORM"] = "cpu"
    env.pop("SEMTOOLS_WORKSPACE", None)
    if home:
        env["HOME"] = str(home)
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-m", "semtools_tpu.cli", *args],
        input=stdin,
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=300,
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    (d / "a.txt").write_text(
        "the quick brown fox\njumps over the lazy dog\nan essay about databases\n"
    )
    (d / "b.txt").write_text("neural networks for vision\nconvolutional layers\n")
    return d


def test_search_files_plain(corpus, tmp_path):
    r = run_cli(
        ["search", "databases", str(corpus / "a.txt"), "--top-k", "1"],
        stdin="",
        home=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert str(corpus / "a.txt") in r.stdout
    assert "an essay about databases" in r.stdout
    # header format: path:start::end (distance)
    assert "::" in r.stdout.splitlines()[0]


def test_search_json_schema(corpus, tmp_path):
    r = run_cli(
        ["search", "fox", str(corpus / "a.txt"), "--top-k", "1", "-j"],
        stdin="",
        home=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    data = json.loads(r.stdout)
    assert set(data) == {"results"}
    row = data["results"][0]
    assert set(row) == {
        "filename",
        "start_line_number",
        "end_line_number",
        "match_line_number",
        "distance",
        "content",
    }


def test_search_stdin(tmp_path):
    r = run_cli(
        ["search", "beta two", "--top-k", "1", "-n", "0"],
        stdin="alpha one\nbeta two\ngamma three\n",
        home=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "<stdin>" in r.stdout
    assert "beta two" in r.stdout


def test_search_no_input_errors(tmp_path):
    r = run_cli(["search", "q"], stdin="", home=tmp_path)
    assert r.returncode == 1
    assert "No input provided" in r.stderr


def test_search_threshold_overrides_topk(corpus, tmp_path):
    r = run_cli(
        ["search", "word", str(corpus / "a.txt"), "--top-k", "1", "-m", "10.0", "-j"],
        stdin="",
        home=tmp_path,
    )
    data = json.loads(r.stdout)
    assert len(data["results"]) == 3  # all lines pass a distance-10 threshold


def test_workspace_end_to_end(corpus, tmp_path):
    r = run_cli(["workspace", "use", "wtest"], stdin="", home=tmp_path)
    assert r.returncode == 0, r.stderr
    assert "export SEMTOOLS_WORKSPACE=wtest" in r.stdout

    env = {"SEMTOOLS_WORKSPACE": "wtest"}
    r = run_cli(
        ["search", "fox", str(corpus / "a.txt"), "--top-k", "1"],
        stdin="",
        home=tmp_path,
        env_extra=env,
    )
    assert r.returncode == 0, r.stderr
    assert "Updating workspace" in r.stderr

    # second run: no re-embed
    r2 = run_cli(
        ["search", "fox", str(corpus / "a.txt"), "--top-k", "1"],
        stdin="",
        home=tmp_path,
        env_extra=env,
    )
    assert "Updating workspace" not in r2.stderr
    assert r2.stdout == r.stdout

    r = run_cli(["workspace", "status", "-j"], stdin="", home=tmp_path, env_extra=env)
    data = json.loads(r.stdout)
    assert data["name"] == "wtest"
    assert data["total_documents"] == 1

    r = run_cli(["workspace", "prune"], stdin="", home=tmp_path, env_extra=env)
    assert "clean" in r.stdout


def test_workspace_status_without_active_errors(tmp_path):
    r = run_cli(["workspace", "status"], stdin="", home=tmp_path)
    assert r.returncode == 1
    assert "No active workspace" in r.stderr


def test_parse_passthrough_and_missing(corpus, tmp_path):
    r = run_cli(
        ["parse", str(corpus / "a.txt"), str(corpus / "nope.pdf")],
        stdin="",
        home=tmp_path,
    )
    assert r.returncode == 0
    lines = r.stdout.splitlines()
    assert lines == [str(corpus / "a.txt"), str(corpus / "nope.pdf")]
    assert "Warning: File does not exist" in r.stderr


def test_ask_requires_api_key(corpus, tmp_path):
    env = {k: "" for k in ("OPENAI_API_KEY",)}
    r = run_cli(
        ["ask", "what?", str(corpus / "a.txt")], stdin="", home=tmp_path, env_extra=env
    )
    assert r.returncode == 1
    assert "API key not found" in r.stderr


def test_version_flag():
    r = run_cli(["--version"])
    assert r.returncode == 0
    assert r.stdout.strip().startswith("semtools ")


def test_version_matches_packaging():
    """__version__ must track pyproject's version — the 0.4.0 release
    bumped only pyproject and `semtools --version` kept printing 0.3.0."""
    import re
    from pathlib import Path

    import semtools_tpu

    pyproject = (Path(semtools_tpu.__file__).parents[1] / "pyproject.toml"
                 ).read_text()
    m = re.search(r'^version = "([^"]+)"', pyproject, re.M)
    assert m and m.group(1) == semtools_tpu.__version__


def test_workspace_global_json_flag_position(corpus, tmp_path):
    # reference clap marks -j global on workspace: accepted before the action
    r = run_cli(["workspace", "use", "gjson"], home=tmp_path)
    assert r.returncode == 0
    r = run_cli(["workspace", "-j", "status"], home=tmp_path,
                env_extra={"SEMTOOLS_WORKSPACE": "gjson"})
    assert r.returncode == 0, r.stderr
    data = json.loads(r.stdout)
    assert set(data) == {
        "name", "root_dir", "total_documents", "slots_live", "slots_allocated"
    }
    assert data["slots_live"] <= data["slots_allocated"]


def test_parse_json_schema(corpus, tmp_path):
    r = run_cli(["parse", "--json", str(corpus / "a.txt")], home=tmp_path)
    assert r.returncode == 0, r.stderr
    data = json.loads(r.stdout)
    assert set(data) == {"results"}
    assert set(data["results"][0]) == {"input_path", "output_path", "was_cached"}


def test_workspace_prune_json_schema(corpus, tmp_path):
    env = {"SEMTOOLS_WORKSPACE": "prunejs"}
    run_cli(["workspace", "use", "prunejs"], home=tmp_path)
    run_cli(["search", "fox", str(corpus / "a.txt")], stdin="", home=tmp_path, env_extra=env)
    r = run_cli(["workspace", "prune", "-j"], home=tmp_path, env_extra=env)
    assert r.returncode == 0, r.stderr
    data = json.loads(r.stdout)
    assert set(data) == {"files_removed", "files_remaining"}


def test_search_queries_file_batch(corpus, tmp_path):
    qf = tmp_path / "queries.txt"
    qf.write_text("databases\n\nneural vision\n")  # blank line skipped
    r = run_cli(
        ["search", "--queries-file", str(qf), str(corpus / "a.txt"),
         str(corpus / "b.txt"), "--top-k", "1", "-n", "0"],
        stdin="", home=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    out = r.stdout
    assert "# query: databases" in out
    assert "# query: neural vision" in out
    assert out.index("databases") < out.index("neural vision")
    assert "an essay about databases" in out
    assert "neural networks for vision" in out


def test_search_queries_file_ndjson(corpus, tmp_path):
    qf = tmp_path / "queries.txt"
    qf.write_text("databases\nneural vision\n")
    r = run_cli(
        ["search", "-Q", str(qf), str(corpus / "a.txt"), str(corpus / "b.txt"),
         "--top-k", "2", "-j"],
        stdin="", home=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 2  # one NDJSON object per query
    for ln, q in zip(lines, ["databases", "neural vision"]):
        data = json.loads(ln)
        assert data["query"] == q
        assert len(data["results"]) == 2
        assert set(data["results"][0]) == {
            "filename", "start_line_number", "end_line_number",
            "match_line_number", "distance", "content",
        }


def test_search_queries_file_stdin_docs(corpus, tmp_path):
    qf = tmp_path / "queries.txt"
    qf.write_text("beta\nalpha\n")
    r = run_cli(
        ["search", "-Q", str(qf), "-n", "0", "-j"],
        stdin="alpha line\nbeta line\n", home=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    first = json.loads(lines[0])
    assert first["query"] == "beta"
    assert first["results"][0]["filename"] == "<stdin>"


def test_search_queries_file_workspace_batch(corpus, tmp_path):
    env = {"SEMTOOLS_WORKSPACE": "qbatch"}
    run_cli(["workspace", "use", "qbatch"], home=tmp_path)
    qf = tmp_path / "queries.txt"
    qf.write_text("databases\nneural vision\n")
    r = run_cli(
        ["search", "-Q", str(qf), str(corpus / "a.txt"), str(corpus / "b.txt"),
         "--top-k", "1", "-j"],
        stdin="", home=tmp_path, env_extra=env,
    )
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 2
    d0 = json.loads(lines[0])
    assert d0["query"] == "databases"
    assert d0["results"][0]["filename"].endswith("a.txt")
    # batched results identical to Q single-query invocations
    for ln, q in zip(lines, ["databases", "neural vision"]):
        r1 = run_cli(
            ["search", q, str(corpus / "a.txt"), str(corpus / "b.txt"),
             "--top-k", "1", "-j"],
            stdin="", home=tmp_path, env_extra=env,
        )
        single = json.loads(r1.stdout)["results"]
        got = json.loads(ln)["results"]
        # identical hits; distances agree to f32 matmul-shape tolerance
        assert [
            {k: v for k, v in r.items() if k != "distance"} for r in got
        ] == [{k: v for k, v in r.items() if k != "distance"} for r in single]
        for g, s in zip(got, single):
            assert abs(g["distance"] - s["distance"]) < 1e-5


def test_search_queries_file_errors(corpus, tmp_path):
    r = run_cli(["search"], stdin="", home=tmp_path)
    assert r.returncode == 2
    assert "QUERY" in r.stderr
    qf = tmp_path / "empty.txt"
    qf.write_text("\n\n")
    r = run_cli(["search", "-Q", str(qf), str(corpus / "a.txt")],
                stdin="", home=tmp_path)
    assert r.returncode == 1
    assert "no queries" in r.stderr
    # '-' without document files: stdin cannot be both queries and document
    r = run_cli(["search", "-Q", "-"], stdin="q1\n", home=tmp_path)
    assert r.returncode == 1
    assert "stdin" in r.stderr


def test_search_queries_file_dash_reads_stdin(corpus, tmp_path):
    r = run_cli(
        ["search", "-Q", "-", str(corpus / "a.txt"), "--top-k", "1", "-j"],
        stdin="databases\n", home=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    data = json.loads(r.stdout.splitlines()[0])
    assert data["query"] == "databases"
    assert "databases" in data["results"][0]["content"]


def test_wedged_backend_falls_back_to_cpu(corpus, tmp_path):
    """A wedged accelerator link must not hang the CLI: with the init
    watchdog tripped (SEMTOOLS_TPU_TEST_WEDGE_INIT simulates the outage)
    the process re-execs itself pinned to CPU, warns loudly, and serves
    the search — including stdin-document mode, whose already-consumed
    stdin is handed across the re-exec."""
    env = {
        "SEMTOOLS_TPU_PLATFORM": "",  # un-pin: the watchdog path under test
        "SEMTOOLS_TPU_TEST_WEDGE_INIT": "1",
        "SEMTOOLS_TPU_INIT_TIMEOUT": "1",
        "SEMTOOLS_TPU_DAEMON": "off",
    }
    r = run_cli(
        ["search", "databases", str(corpus / "a.txt"), "--top-k", "1"],
        stdin="", home=tmp_path, env_extra=env,
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "an essay about databases" in r.stdout
    assert "wedged" in r.stderr and "CPU" in r.stderr

    # stdin-document mode across the re-exec
    r = run_cli(
        ["search", "beta", "-n", "0"],
        stdin="alpha\nbeta\n", home=tmp_path, env_extra=env,
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "beta" in r.stdout


def test_wedged_backend_status_falls_back(corpus, tmp_path):
    """`workspace status` forces device discovery on non-trivial stores
    (cold/warm tier agreement) — under a wedged link it must degrade to
    CPU, not hang. The sharded floor is lowered so a 3-line store
    qualifies as 'non-trivial'."""
    base = {"SEMTOOLS_TPU_DAEMON": "off", "SEMTOOLS_TPU_SHARDED_MIN_ROWS": "1"}
    r = run_cli(["workspace", "use", "wt"], stdin="", home=tmp_path,
                env_extra=base)
    assert r.returncode == 0, r.stderr
    r = run_cli(["search", "fox", str(corpus / "a.txt")], stdin="",
                home=tmp_path, env_extra={**base, "SEMTOOLS_WORKSPACE": "wt"})
    assert r.returncode == 0, r.stderr

    wedge = {
        **base,
        "SEMTOOLS_WORKSPACE": "wt",
        "SEMTOOLS_TPU_PLATFORM": "",
        "SEMTOOLS_TPU_TEST_WEDGE_INIT": "1",
        "SEMTOOLS_TPU_INIT_TIMEOUT": "1",
    }
    r = run_cli(["workspace", "status"], stdin="", home=tmp_path,
                env_extra=wedge)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "wedged" in r.stderr
    assert "Documents: 1" in r.stdout
