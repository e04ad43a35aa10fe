"""The executable agent-quality eval harness (benchmarks/arxiv/run_agent_eval.py)
stays runnable and its scorer stays honest.

Small-corpus end-to-end run of a subset of questions through both API
modes, plus direct scorer checks (a fabricated citation must score
invalid — the scorer re-reads files from disk, independent of the
policy).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks" / "arxiv"))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from gen_text_corpus import gen

    root = tmp_path_factory.mktemp("agent_eval_corpus")
    truth = gen(root, n_papers=40)
    files = sorted(str(p) for p in (root / "full_text").glob("*.txt"))
    return root, truth, files


@pytest.mark.parametrize("mode_name", ["responses", "chat"])
def test_policy_agent_end_to_end(corpus, fallback_model, mode_name, tmp_path, monkeypatch):
    from run_agent_eval import PolicyLLM, score_answer
    from run_retrieval_eval import QUESTIONS

    from gen_text_corpus import TOPICS
    from semtools_tpu.ask.agent import ask_agent
    from semtools_tpu.ask.config import ApiMode
    from semtools_tpu.ask.openai_client import OpenAIClient
    from tests.fake_servers import FakeServer

    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setenv("SEMTOOLS_TPU_DAEMON", "off")
    root, truth, files = corpus
    mode = ApiMode(mode_name)
    # one of each: semantic, grep, cross-reference (exercises read)
    picked = [q for q in QUESTIONS if q[0] in ("a1", "a2", "b2")]
    for question in picked:
        policy = PolicyLLM(question)
        server = FakeServer(policy)
        with server:
            client = OpenAIClient("k", server.url)
            out = ask_agent(
                files, question[3], fallback_model, client, "policy-llm",
                max_iterations=10, api_mode=mode,
            )
        r = score_answer(out.response, question, TOPICS, truth)
        assert r["structural_ok"], out.response
        assert r["answered"], (question[0], out.response)
        assert r["citation_validity"] == 1.0, (question[0], out.response)
        if question[0] == "b2" and mode_name == "responses":
            # the cross-reference plan issued search AND read
            calls = [e[1] for e in policy.log if e[0] == "tool_call"]
            assert calls == ["search", "read"]


def test_scorer_rejects_fabricated_citations(corpus):
    from run_agent_eval import score_answer
    from run_retrieval_eval import QUESTIONS

    from gen_text_corpus import TOPICS

    root, truth, files = corpus
    q_a1 = next(q for q in QUESTIONS if q[0] == "a1")

    # citation to a nonexistent file
    bad = (
        "Claim [1].\n\n## References\n[1] /nonexistent/file.txt:3"
    )
    r = score_answer(bad, q_a1, TOPICS, truth)
    assert r["citations_valid"] == 0 and not r["answered"]

    # citation to a real file but an unsupporting line (blank line 1)
    real = files[0]
    bad2 = f"Claim [1].\n\n## References\n[1] {real}:1"
    r2 = score_answer(bad2, q_a1, TOPICS, truth)
    assert r2["citations_valid"] == 0

    # out-of-range line number
    bad3 = f"Claim [1].\n\n## References\n[1] {real}:99999"
    r3 = score_answer(bad3, q_a1, TOPICS, truth)
    assert r3["citations_valid"] == 0

    # marker without a matching reference entry fails structurally
    bad4 = f"Claim [1] and [2].\n\n## References\n[1] {real}:0"
    r4 = score_answer(bad4, q_a1, TOPICS, truth)
    assert not r4["structural_ok"]


def test_scorer_accepts_genuine_citation(corpus):
    from run_agent_eval import score_answer
    from run_retrieval_eval import QUESTIONS

    from gen_text_corpus import TOPICS

    root, truth, files = corpus
    q_a1 = next(q for q in QUESTIONS if q[0] == "a1")
    bank = set(TOPICS["attention"])
    # find a real (file, line) carrying an attention bank sentence
    for f in files:
        lines = Path(f).read_text().splitlines()
        hit = next((i for i, ln in enumerate(lines) if ln in bank), None)
        if hit is not None:
            good = f"Claim [1].\n\n## References\n[1] {f}:{hit}"
            r = score_answer(good, q_a1, TOPICS, truth)
            assert r["citations_valid"] == 1 and r["answered"]
            return
    pytest.fail("corpus contained no attention bank line")
