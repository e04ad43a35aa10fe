"""Ask agent tests against a scripted fake OpenAI server.

The reference's agent loop and tools are untested (SURVEY.md §4). Covered
here: both API modes' loops, tool dispatch + argument parsing, chunk
formatting, files_searched tracking, max-iteration fallback, stdin mode,
and the grep/read/search tools directly.
"""

import json

import pytest

from semtools_tpu.ask.agent import (
    AskOutput,
    ask_agent,
    ask_agent_with_stdin,
    call_tool,
)
from semtools_tpu.ask.config import ApiMode
from semtools_tpu.ask.openai_client import OpenAIClient
from semtools_tpu.ask.tools import grep_tool, read_tool
from tests.fake_servers import (
    FakeOpenAI,
    FakeServer,
    chat_text_response,
    chat_tool_call_response,
    responses_text,
    responses_tool_call,
)


@pytest.fixture()
def corpus(tmp_path):
    f1 = tmp_path / "notes.txt"
    f1.write_text("alpha line\nbeta line\ngamma target line\ndelta line\n")
    f2 = tmp_path / "other.txt"
    f2.write_text("unrelated content\nmore text\n")
    return [str(f1), str(f2)]


def client_for(script):
    server = FakeServer(FakeOpenAI(script))
    return server


# -- tools directly ---------------------------------------------------------


def test_read_tool_chunk_format(corpus):
    out = read_tool(corpus[0], 1, 3)
    assert out.startswith(f"<chunk file={corpus[0]} start=1 end=3>\n")
    assert "beta line\ngamma target line" in out
    assert out.endswith("</chunk>\n")


def test_read_tool_clamps_end(corpus):
    out = read_tool(corpus[0], 2, 99)
    assert "end=4>" in out


def test_grep_literal_and_context(corpus):
    out = grep_tool(corpus, "gamma target", context_lines=1)
    assert "<chunk file=" in out
    assert "start=1 end=4" in out
    assert "beta line" in out  # context


def test_grep_regex_and_case(corpus):
    assert "No matches found." == grep_tool(corpus, "GAMMA", case_sensitive=True)
    out = grep_tool(corpus, "GAMMA", case_sensitive=False)
    assert "gamma target line" in out
    out = grep_tool(corpus, r"ga.{2}a", is_regex=True)
    assert "gamma" in out


def test_grep_literal_escapes_regex_chars(tmp_path):
    f = tmp_path / "code.txt"
    f.write_text("x = arr[0]\ny = 2\n")
    out = grep_tool([str(f)], "arr[0]")
    assert "arr[0]" in out


def test_grep_invalid_regex(corpus):
    with pytest.raises(ValueError, match="Invalid regex"):
        grep_tool(corpus, "(unclosed", is_regex=True)


def test_grep_restricts_to_file_paths(corpus):
    out = grep_tool(corpus, "line", file_paths=[corpus[1]])
    assert "No matches found." == out  # 'line' only in notes.txt


# -- call_tool dispatch -----------------------------------------------------


def test_call_tool_search(corpus, fallback_model, capsys):
    out_state = AskOutput(query="q", response="")
    result = call_tool(
        "search",
        json.dumps({"query": "gamma target", "config": {"top_k": 1, "n_lines": 1}}),
        corpus,
        fallback_model,
        out_state,
    )
    assert "<chunk file=" in result
    assert "distance=" in result
    assert corpus[0] in out_state.files_searched
    logged = capsys.readouterr().out
    assert "[Tool Call: search]" in logged


def test_call_tool_unknown_name(corpus, fallback_model):
    with pytest.raises(ValueError, match="Unknown tool"):
        call_tool("nope", "{}", corpus, fallback_model, AskOutput("q", ""))


def test_call_tool_missing_args(corpus, fallback_model):
    with pytest.raises(ValueError, match="Missing 'pattern'"):
        call_tool("grep", "{}", corpus, fallback_model, AskOutput("q", ""))


# -- agent loops ------------------------------------------------------------


def test_chat_agent_tool_loop(corpus, fallback_model):
    script = [
        chat_tool_call_response("read", {"path": corpus[0], "start_line": 0, "end_line": 2}),
        chat_text_response("Answer with citation [1].\n\n## References\n[1] notes.txt:1"),
    ]
    server = client_for(script)
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent(
            corpus, "what?", fallback_model, client, "gpt-test", 5,
            api_mode=ApiMode.CHAT,
        )
    assert "Answer with citation" in out.response
    assert corpus[0] in out.files_searched
    # second request must include the tool result in history
    app = server.app
    second = app.requests[1]["body"]
    roles = [m["role"] for m in second["messages"]]
    assert "tool" in roles


def test_responses_agent_tool_loop(corpus, fallback_model):
    script = [
        responses_tool_call("grep", {"pattern": "gamma target"}),
        responses_text("Found it [1].\n\n## References\n[1] notes.txt:3"),
    ]
    server = client_for(script)
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent(
            corpus, "where is gamma?", fallback_model, client, "gpt-test", 5,
            api_mode=ApiMode.RESPONSES,
        )
    assert out.response.startswith("Found it")
    app = server.app
    # second request's input must carry the function_call_output
    second = app.requests[1]["body"]
    types = [it.get("type") for it in second["input"]]
    assert "function_call_output" in types
    assert second["store"] is False
    assert second["max_output_tokens"] == 4096


def test_max_iterations_fallback(corpus, fallback_model):
    script = [
        responses_tool_call("read", {"path": corpus[0], "start_line": 0, "end_line": 1}),
        responses_tool_call("read", {"path": corpus[0], "start_line": 1, "end_line": 2}),
    ]
    server = client_for(script)
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent(
            corpus, "q", fallback_model, client, "gpt-test", 2,
            api_mode=ApiMode.RESPONSES,
        )
    assert "Max iterations (2) reached" in out.response


def test_stdin_mode_chat(fallback_model):
    server = client_for([chat_text_response("stdin answer")])
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent_with_stdin("piped content", "summarize", client, "gpt-test", ApiMode.CHAT)
    assert out.response == "stdin answer"
    assert out.files_searched == ["<stdin>"]
    body = server.app.requests[0]["body"]
    assert "tools" not in body
    assert "<stdin_content>" in body["messages"][1]["content"]


def test_stdin_mode_responses(fallback_model):
    server = client_for([responses_text("resp answer")])
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent_with_stdin("piped", "q", client, "gpt-test", ApiMode.RESPONSES)
    assert out.response == "resp answer"


def test_tool_definitions_sent(corpus, fallback_model):
    server = client_for([responses_text("done")])
    with server:
        client = OpenAIClient("k", server.url)
        ask_agent(corpus, "q", fallback_model, client, "m", 3, api_mode=ApiMode.RESPONSES)
    body = server.app.requests[0]["body"]
    names = {t["name"] for t in body["tools"]}
    assert names == {"grep", "search", "read"}
    assert body["instructions"]  # system prompt via instructions param


def test_grep_unicode_routes_to_python_semantics(tmp_path):
    # The native std::regex scanner is byte-oriented; patterns/content
    # needing Unicode tables must produce Python re results regardless of
    # whether the native library is loaded.
    f = tmp_path / "u.txt"
    f.write_text(
        "plain ascii line\n"
        "digit ٣ arabic-indic\n"      # \d matches U+0663 in Python re
        "café lower\n"
        "CAFÉ UPPER\n",
        encoding="utf-8",
    )
    files = [str(f)]
    # Unicode digit class over non-ASCII content
    out = grep_tool(files, r"\d", is_regex=True, context_lines=0)
    assert "arabic-indic" in out
    # non-ASCII pattern, case-insensitive: must fold É -> é
    out = grep_tool(files, "café", case_sensitive=False, context_lines=0)
    assert "lower" in out and "UPPER" in out
    # ASCII-only literal on the same file still matches (any route)
    out = grep_tool(files, "plain ascii", context_lines=0)
    assert "plain ascii line" in out


def test_native_grep_safe_predicate():
    from semtools_tpu.ask.tools import _native_grep_safe

    ascii_lines = ["abc", "123"]
    uni_lines = ["abc", "café"]
    assert _native_grep_safe("foo", False, uni_lines)          # plain literal: byte-safe
    assert _native_grep_safe(r"\d+", False, ascii_lines)       # classes ok on ascii
    assert not _native_grep_safe(r"\d+", False, uni_lines)     # classes + unicode content
    assert not _native_grep_safe("foo", True, uni_lines)       # icase + unicode content
    assert _native_grep_safe("foo", True, ascii_lines)
    assert not _native_grep_safe("café", False, ascii_lines)  # non-ascii pattern


def test_grep_wildcard_over_unicode_content(tmp_path):
    # Review regression: '.' is bytewise in std::regex ('x.y' must match
    # 'x€y' — one CHARACTER, three bytes); negated classes likewise.
    f = tmp_path / "w.txt"
    f.write_text("x€y wildcard line\nplain xzy line\n", encoding="utf-8")
    out = grep_tool([str(f)], "x.y", is_regex=True, context_lines=0)
    assert "wildcard line" in out and "plain xzy line" in out
    out = grep_tool([str(f)], "x[^a]y", is_regex=True, context_lines=0)
    assert "wildcard line" in out


def test_bytewise_unsafe_construct_detection():
    from semtools_tpu.ask.tools import _has_bytewise_unsafe_construct as unsafe

    assert unsafe("x.y")
    assert unsafe("a[^b]c")
    assert not unsafe(r"x\.y")       # escaped dot is a literal byte
    assert not unsafe("[abc]+")      # positive class is ASCII-exact
    assert not unsafe(r"foo\[^bar")  # escaped bracket
    assert not unsafe("plain words")
    assert unsafe("[a-z][^0-9]")


def test_grep_escape_named_codepoints_route_to_python(tmp_path):
    # r"caf\xe9" names é via an ASCII escape: Python matches the CHARACTER,
    # the bytewise native engine would match a lone 0xE9 byte (never
    # present in UTF-8) and silently miss.
    f = tmp_path / "e.txt"
    f.write_text("café escape line\nplain cafe line\n", encoding="utf-8")
    out = grep_tool([str(f)], r"caf\xe9", is_regex=True, context_lines=0)
    assert "escape line" in out
    out = grep_tool([str(f)], r"café", is_regex=True, context_lines=0)
    assert "escape line" in out


def _responses_multi_tool_call(calls):
    return {
        "output": [
            {
                "type": "function_call",
                "name": name,
                "arguments": json.dumps(args),
                "call_id": f"call_{i}",
                "id": f"fc_{i}",
            }
            for i, (name, args) in enumerate(calls)
        ]
    }


def test_parallel_search_calls_served_batched(corpus, fallback_model, monkeypatch, capsys):
    """Several search calls in ONE LLM turn run as one batched scan, with
    per-call outputs/logs preserved in call order."""
    import semtools_tpu.ask.agent as agent_mod
    import semtools_tpu.ask.tools as tools_mod

    batched_calls = []
    real_batched = tools_mod.search_tool_batched

    def spy_batched(files, queries, *a, **kw):
        batched_calls.append(list(queries))
        return real_batched(files, queries, *a, **kw)

    monkeypatch.setattr(tools_mod, "search_tool_batched", spy_batched)

    def forbid_single(*a, **kw):
        raise AssertionError("single-query search_tool must not run for a parallel batch")

    monkeypatch.setattr(agent_mod, "search_tool", forbid_single)

    script = [
        _responses_multi_tool_call([
            ("search", {"query": "gamma target line"}),
            ("search", {"query": "unrelated content"}),
            ("read", {"path": corpus[0], "start_line": 0, "end_line": 1}),
        ]),
        responses_text("Done [1].\n\n## References\n[1] notes.txt:3"),
    ]
    server = client_for(script)
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent(
            corpus, "q?", fallback_model, client, "gpt-test", 5,
            api_mode=ApiMode.RESPONSES,
        )
    assert out.response.startswith("Done")
    assert batched_calls == [["gamma target line", "unrelated content"]]
    # every call got its own output, in order, with the right content
    second = server.app.requests[1]["body"]
    fco = [it for it in second["input"] if it.get("type") == "function_call_output"]
    assert [o["call_id"] for o in fco] == ["call_0", "call_1", "call_2"]
    assert "gamma target line" in fco[0]["output"]
    assert "unrelated content" in fco[1]["output"]
    assert fco[2]["output"].startswith(f"<chunk file={corpus[0]}")
    logs = capsys.readouterr().out
    assert logs.count("[Tool Call: search]") == 2
    assert logs.index('query: "gamma target line"') < logs.index('query: "unrelated content"')


def test_parallel_search_different_configs_stay_single(corpus, fallback_model, monkeypatch):
    """Mismatched per-call configs fall back to per-call execution
    (search_tool itself is a batch of ONE through the batched impl, so
    only multi-query batches are forbidden here)."""
    import semtools_tpu.ask.tools as tools_mod

    real_batched = tools_mod.search_tool_batched

    def forbid_multi(files, queries, *a, **kw):
        assert len(queries) == 1, "configs differ: must not batch together"
        return real_batched(files, queries, *a, **kw)

    monkeypatch.setattr(tools_mod, "search_tool_batched", forbid_multi)
    script = [
        _responses_multi_tool_call([
            ("search", {"query": "gamma", "config": {"top_k": 1}}),
            ("search", {"query": "alpha", "config": {"top_k": 2}}),
        ]),
        responses_text("ok [1].\n\n## References\n[1] notes.txt:1"),
    ]
    server = client_for(script)
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent(
            corpus, "q?", fallback_model, client, "gpt-test", 5,
            api_mode=ApiMode.RESPONSES,
        )
    assert out.response.startswith("ok")


def test_parallel_search_calls_chat_mode(corpus, fallback_model):
    script = [
        {
            "choices": [{
                "message": {
                    "role": "assistant", "content": None,
                    "tool_calls": [
                        {"id": f"c{i}", "type": "function",
                         "function": {"name": "search",
                                      "arguments": json.dumps({"query": q})}}
                        for i, q in enumerate(["gamma target", "delta line"])
                    ],
                }
            }]
        },
        chat_text_response("fine [1].\n\n## References\n[1] notes.txt:3"),
    ]
    server = client_for(script)
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent(
            corpus, "q?", fallback_model, client, "gpt-test", 5,
            api_mode=ApiMode.CHAT,
        )
    assert out.response.startswith("fine")
    second = server.app.requests[1]["body"]
    tool_msgs = [m for m in second["messages"] if m["role"] == "tool"]
    assert [m["tool_call_id"] for m in tool_msgs] == ["c0", "c1"]
    assert "gamma target" in tool_msgs[0]["content"]


# -- tool-fault recovery ------------------------------------------------------
#
# Fault semantics (see execute_tool_calls): a malformed tool call becomes
# an "Error: ..." tool OUTPUT for that call only; the loop continues.
# (The reference aborts the whole ask on the first tool error —
# chat_agent.rs:92 `?` — an availability hazard this framework fixes.)


def _raw_responses_tool_call(name, raw_args, call_id="call_1"):
    return {
        "output": [
            {
                "type": "function_call",
                "name": name,
                "arguments": raw_args,
                "call_id": call_id,
                "id": "fc_1",
            }
        ]
    }


def test_malformed_json_args_fed_back(corpus, fallback_model):
    script = [
        _raw_responses_tool_call("search", '{"query": "alpha", '),  # cut off
        responses_text("Recovered [1].\n\n## References\n[1] notes.txt:1"),
    ]
    server = client_for(script)
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent(
            corpus, "q", fallback_model, client, "gpt-test", 5,
            api_mode=ApiMode.RESPONSES,
        )
    assert out.response.startswith("Recovered")
    second = server.app.requests[1]["body"]
    fco = [it for it in second["input"] if it.get("type") == "function_call_output"]
    assert len(fco) == 1 and fco[0]["output"].startswith("Error:")


def test_unknown_tool_fed_back(corpus, fallback_model):
    script = [
        responses_tool_call("teleport", {"to": "mars"}),
        responses_text("Sorry, wrong tool. [1]\n\n## References\n[1] notes.txt:1"),
    ]
    server = client_for(script)
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent(
            corpus, "q", fallback_model, client, "gpt-test", 5,
            api_mode=ApiMode.RESPONSES,
        )
    assert "wrong tool" in out.response
    second = server.app.requests[1]["body"]
    fco = [it for it in second["input"] if it.get("type") == "function_call_output"]
    assert fco[0]["output"] == "Error: Unknown tool: teleport"


def test_missing_required_param_fed_back(corpus, fallback_model):
    script = [
        responses_tool_call("read", {"start_line": 0, "end_line": 2}),  # no path
        responses_text("Fixed [1].\n\n## References\n[1] notes.txt:1"),
    ]
    server = client_for(script)
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent(
            corpus, "q", fallback_model, client, "gpt-test", 5,
            api_mode=ApiMode.RESPONSES,
        )
    assert out.response.startswith("Fixed")
    second = server.app.requests[1]["body"]
    fco = [it for it in second["input"] if it.get("type") == "function_call_output"]
    assert "Missing 'path' parameter" in fco[0]["output"]


def test_mixed_good_and_bad_calls_in_one_turn(corpus, fallback_model):
    bad = _raw_responses_tool_call("search", "not json at all", "call_a")
    good = responses_tool_call("grep", {"pattern": "gamma target"}, "call_b")
    turn = {"output": bad["output"] + good["output"]}
    script = [
        turn,
        responses_text("Both handled [1].\n\n## References\n[1] notes.txt:3"),
    ]
    server = client_for(script)
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent(
            corpus, "q", fallback_model, client, "gpt-test", 5,
            api_mode=ApiMode.RESPONSES,
        )
    assert out.response.startswith("Both handled")
    second = server.app.requests[1]["body"]
    fco = {it["call_id"]: it["output"]
           for it in second["input"]
           if it.get("type") == "function_call_output"}
    assert fco["call_a"].startswith("Error:")
    assert "gamma target" in fco["call_b"]


def test_chat_mode_tool_fault_fed_back(corpus, fallback_model):
    script = [
        chat_tool_call_response("read", {"path": corpus[0]}),  # missing lines
        chat_text_response("Retry worked [1].\n\n## References\n[1] notes.txt:1"),
    ]
    server = client_for(script)
    with server:
        client = OpenAIClient("k", server.url)
        out = ask_agent(
            corpus, "q", fallback_model, client, "gpt-test", 5,
            api_mode=ApiMode.CHAT,
        )
    assert "Retry worked" in out.response
    second = server.app.requests[1]["body"]
    tool_msgs = [m for m in second["messages"] if m["role"] == "tool"]
    assert tool_msgs and "Missing 'start_line' parameter" in tool_msgs[0]["content"]


def test_dialect_divergent_constructs_route_to_python(tmp_path):
    """Constructs both engines ACCEPT but parse differently (found by
    scripts/fuzz_grep_dialect.py) must serve Python re semantics: \\A/\\Z
    (ECMAScript identity-escapes to literal A/Z), POSIX bracket classes,
    a leading ] in a class ("[]a]"), and \\B (matches "" natively)."""
    f = tmp_path / "d.txt"
    f.write_text("Afoo\nfoo\n123\ndigit\n]\na\n\nfooZ\nend foo\n")
    lines = f.read_text().splitlines()

    import re as _re

    for pat in (r"\Afoo", r"foo\Z", r"[[:digit:]]+", r"[]a]", r"[^]a]",
                r"\B"):
        want = [i for i, ln in enumerate(lines) if _re.search(pat, ln)]
        out = grep_tool([str(f)], pat, is_regex=True, context_lines=0)
        got = sorted(
            int(m.group(1))
            for m in _re.finditer(r"<chunk file=\S+ start=(\d+)", out)
        )
        assert got == want, (pat, got, want)


def test_native_grep_safe_rejects_divergent_constructs():
    from semtools_tpu.ask.tools import _native_grep_safe

    for pat in (r"\Ax", r"x\Z", r"[[:digit:]]", r"[[.a.]]", r"[[=a=]]",
                r"[]a]", r"[^]a]", r"a\B"):
        assert not _native_grep_safe(pat, False, ["ascii"]), pat
    # common safe patterns still take the native path
    for pat in ("error", r"foo (bar|baz)+", r"^x{1,3}$", r"[a-f0-9]+"):
        assert _native_grep_safe(pat, False, ["ascii"]), pat


def test_unicode_property_classes_match_rust_regex_semantics(tmp_path):
    """\\p{..} classes are valid in the reference's rust-regex grep
    dialect (/root/reference/src/ask/tools.rs:443-516). They must MATCH
    here (via the regex module's UTS#18 properties) instead of bouncing
    "Invalid regex pattern: bad escape \\p" back to the agent — on both
    ASCII and non-ASCII content."""
    f = tmp_path / "u.txt"
    f.write_text("abc\n123\ncafé\nΣigma\n٠٦٦٠\n--- \n")
    lines = f.read_text().splitlines()

    import re as _re

    def hits(pat):
        out = grep_tool([str(f)], pat, is_regex=True, context_lines=0)
        if out == "No matches found.":
            return []
        return sorted(
            int(m.group(1))
            for m in _re.finditer(r"<chunk file=\S+ start=(\d+)", out)
        )

    assert hits(r"\p{L}") == [0, 2, 3]          # letters incl. é, Σ
    assert hits(r"\p{N}") == [1, 4]             # decimal digits incl. ٠
    assert hits(r"\p{Alpha}") == [0, 2, 3]      # POSIX-name alias
    assert hits(r"^\P{L}+$") == [1, 4, 5]       # lines with no letter
    assert hits(r"\pL") == [0, 2, 3]            # single-letter form
    assert hits(r"\p{Lu}") == [3]               # uppercase: Σ only
    assert hits(r"\p{Greek}") == [3]            # script property
    # invalid property names still surface a clear error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="Invalid regex pattern"):
        grep_tool([str(f)], r"\p{NoSuchProp}", is_regex=True)


def test_unicode_property_patterns_route_to_python():
    from semtools_tpu.ask.tools import _native_grep_safe

    for pat in (r"\p{L}", r"\P{N}+", r"x\pLy"):
        assert not _native_grep_safe(pat, False, ["ascii"]), pat
