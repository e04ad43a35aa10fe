"""Executable agent-quality eval: all 15 questions through `ask`, scored.

The reference's arxiv benchmark is 30 RAW agent transcripts
(benchmarks/arxiv/answers/, README.md:34-41) produced with a live LLM and
never scored. This is the executable analogue the framework can run and
commit offline: a deterministic POLICY LLM (an in-process OpenAI-compatible
server that composes each turn from the tool outputs in the request — the
same fake-server transport the hermetic ask tests use) drives
``ask_agent`` end-to-end over the synthetic arxiv-style corpus
(gen_text_corpus.py) for all 15 questions (questions.txt), in BOTH API
modes (Chat Completions + Responses).

What this proves that the retrieval eval (run_retrieval_eval.py) cannot:
the full agent loop — tool schemas, dispatch, ``<chunk>`` envelopes,
multi-iteration history threading, citation plumbing — carries retrieval
results into a final answer whose citations CHECK OUT. The scorer is
independent of the policy: it re-reads every ``[n] file:lines`` reference
from disk and requires the cited line to actually support the claim
(membership in the question's ground-truth topic bank for semantic
questions; a literal pattern match for grep questions).

Outputs:
    answers/{responses,chat}/<qid>.txt   30 committed transcripts
    RESULTS_AGENT.json                   per-question + aggregate scores

Run:  SEMTOOLS_TPU_PLATFORM=cpu python benchmarks/arxiv/run_agent_eval.py
      [--papers 400] [--out RESULTS_AGENT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tests"))

from run_retrieval_eval import QUESTIONS  # noqa: E402

CHUNK_RE = re.compile(r"<chunk file=(\S+) start=(\d+) end=(\d+)[^>]*>\n?")
REF_RE = re.compile(r"^\[(\d+)\]\s+(\S+?):([0-9,\-]+)\s*$", re.M)
MARKER_RE = re.compile(r"\[(\d+)\]")


def parse_chunks(text: str):
    """(file, start, end, first_line) for every chunk envelope in a tool
    output. start/end are the tools' 0-based [start, end) convention."""
    out = []
    for m in CHUNK_RE.finditer(text):
        body = text[m.end():]
        body = body.split("</chunk>", 1)[0]
        first = body.splitlines()[0] if body.splitlines() else ""
        out.append((m.group(1), int(m.group(2)), int(m.group(3)), first))
    return out


# -- the policy LLM ----------------------------------------------------------


class PolicyLLM:
    """Deterministic agent policy for one question, served over HTTP.

    Stage k of the conversation (k = number of tool outputs present in
    the request history) either issues plan step k or, once the plan is
    exhausted, composes the final cited answer from every chunk the
    tools returned. The transcript log records each turn.
    """

    def __init__(self, question):
        self.qid, self.family, self.kind, self.query, self.topics = question
        self.log = []

    # transport-level glue -------------------------------------------------

    def handle(self, method, path, headers, body):
        req = json.loads(body) if body else {}
        outputs = self._tool_outputs(path, req)
        self._log_outputs(outputs)
        step = self._plan_step(len(outputs), outputs)
        if step is not None:
            name, args = step
            self.log.append(("tool_call", name, args))
            return self._call_response(path, name, json.dumps(args),
                                       len(outputs))
        answer = self._compose(outputs)
        self.log.append(("answer", answer))
        return self._final_response(path, answer)

    def _log_outputs(self, outputs):
        n_logged = sum(1 for e in self.log if e[0] == "tool_output")
        for out in outputs[n_logged:]:
            head = out if len(out) <= 400 else out[:400] + "…[truncated]"
            self.log.append(("tool_output", head))

    @staticmethod
    def _call_response(path, name, raw_args, n):
        """A tool-call turn; ``raw_args`` is the LITERAL arguments string
        (the fault modes send intentionally broken JSON through here)."""
        if path.endswith("/responses"):
            return 200, {"output": [{
                "type": "function_call", "name": name,
                "arguments": raw_args,
                "call_id": f"call_{n}", "id": f"fc_{n}",
            }]}
        return 200, {"choices": [{"message": {
            "role": "assistant", "content": None,
            "tool_calls": [{
                "id": f"call_{n}", "type": "function",
                "function": {"name": name, "arguments": raw_args},
            }],
        }}]}

    @staticmethod
    def _final_response(path, answer):
        if path.endswith("/responses"):
            return 200, {"output": [{
                "type": "message", "role": "assistant",
                "content": [{"type": "output_text", "text": answer}],
            }]}
        return 200, {"choices": [{"message": {
            "role": "assistant", "content": answer,
        }}]}

    @staticmethod
    def _tool_outputs(path, req):
        if path.endswith("/responses"):
            return [it.get("output", "") for it in req.get("input", [])
                    if it.get("type") == "function_call_output"]
        return [m.get("content", "") for m in req.get("messages", [])
                if m.get("role") == "tool"]

    # the plan -------------------------------------------------------------

    def _plan_step(self, stage, outputs):
        if self.kind == "grep":
            plan_len = 1
            if stage == 0:
                return "grep", {"pattern": self.query, "context_lines": 0}
        else:
            # cross-reference questions also exercise `read`: pull wider
            # context around the top search hit before answering.
            plan_len = 2 if self.family == "cross_reference" else 1
            if stage == 0:
                return "search", {
                    "query": self.query,
                    "config": {"top_k": 8, "n_lines": 0},
                }
            if stage == 1 and plan_len == 2:
                chunks = parse_chunks(outputs[0])
                if chunks:
                    f, s, _, _ = chunks[0]
                    return "read", {
                        "path": f, "start_line": s, "end_line": s + 3,
                    }
                plan_len = 1
        if stage < plan_len:
            return None  # defensive; fall through to answer
        return None

    # the answer -----------------------------------------------------------

    def _compose(self, outputs):
        chunks = []
        for out in outputs:
            chunks.extend(parse_chunks(out))
        # one citation per distinct file; the WIDEST chunk for a file wins
        # (a read-tool range beats the single search line it expanded), and
        # file order follows best search rank
        best = {}
        order = []
        for f, s, e, first in chunks:
            if f not in best:
                order.append(f)
                best[f] = (f, s, e, first)
            elif e - s > best[f][2] - best[f][1]:
                best[f] = (f, s, e, first)
        picked = [best[f] for f in order[:5]]
        if not picked:
            return f"No relevant material found for: {self.query}"
        claims, refs = [], []
        for n, (f, s, e, first) in enumerate(picked, 1):
            stem = Path(f).stem
            claims.append(f'{stem} states "{first}" [{n}].')
            if e - s > 1:
                refs.append(f"[{n}] {f}:{s}-{e}")
            else:
                refs.append(f"[{n}] {f}:{s}")
        return (
            f"Findings for: {self.query}\n\n" + "\n".join(claims)
            + "\n\n## References\n" + "\n".join(refs)
        )


# -- fault-injection policy ----------------------------------------------------


FAULT_MODES = (
    "malformed_json",  # first call's arguments are truncated JSON
    "unknown_tool",    # first call names a tool that does not exist
    "missing_param",   # first call omits a required parameter
    "no_citations",    # final answer carries no references section
    "stall",           # never answers: the loop must hit max_iterations
)


class FaultyPolicy(PolicyLLM):
    """PolicyLLM with ONE injected fault (VERDICT r3 #4: the clean policy
    always emitted well-formed calls, so 'citation validity 1.0' mostly
    validated the scorer — these modes exercise the loop's recovery).

    Recoverable modes (malformed_json / unknown_tool / missing_param)
    inject the broken call at stage 0; the framework must feed the
    "Error: ..." back as that call's tool output and keep the loop alive,
    after which the policy resumes its normal plan — so the run is scored
    like a clean one PLUS the requirement that the first tool output is
    the error. `no_citations` completes the plan but answers without
    references (the scorer must mark it unanswered; the loop must not
    crash). `stall` never stops calling tools: the loop must return the
    verbatim max-iterations message.
    """

    def __init__(self, question, fault: str):
        super().__init__(question)
        assert fault in FAULT_MODES, fault
        self.fault = fault

    def handle(self, method, path, headers, body):
        req = json.loads(body) if body else {}
        outputs = self._tool_outputs(path, req)
        self._log_outputs(outputs)
        if self.fault == "stall":
            self.log.append(("tool_call", "grep", {"pattern": self.query}))
            return self._call_response(
                path, "grep",
                json.dumps({"pattern": self.query, "context_lines": 0}),
                len(outputs),
            )
        if not outputs:  # stage 0: inject the broken call
            if self.fault == "malformed_json":
                self.log.append(("tool_call", "search", "<malformed json>"))
                return self._call_response(
                    path, "search", '{"query": "x", ', 0
                )
            if self.fault == "unknown_tool":
                self.log.append(("tool_call", "teleport", {}))
                return self._call_response(path, "teleport", "{}", 0)
            if self.fault == "missing_param":
                self.log.append(("tool_call", "read", {}))
                return self._call_response(path, "read", "{}", 0)
        if self.fault in ("malformed_json", "unknown_tool", "missing_param"):
            # the error output occupies stage 0; shift the plan down one
            step = self._plan_step(len(outputs) - 1, outputs[1:])
            if step is not None:
                name, args = step
                self.log.append(("tool_call", name, args))
                return self._call_response(path, name, json.dumps(args),
                                           len(outputs))
            answer = self._compose(outputs[1:])
            self.log.append(("answer", answer))
            return self._final_response(path, answer)
        # no_citations: normal plan, citation-free answer
        step = self._plan_step(len(outputs), outputs)
        if step is not None:
            name, args = step
            self.log.append(("tool_call", name, args))
            return self._call_response(path, name, json.dumps(args),
                                       len(outputs))
        answer = f"I believe the answer involves {self.query}, but I am sure."
        self.log.append(("answer", answer))
        return self._final_response(path, answer)


def run_fault_injection(files, model, modes) -> list:
    """Every fault mode through both API loops on a representative
    semantic question and a grep question. Returns records with
    crashed / recovered / expected-behavior flags (RESULTS_AGENT's
    fault_injection section; 0 crashes is the gate)."""
    from semtools_tpu.ask.agent import ask_agent
    from semtools_tpu.ask.openai_client import OpenAIClient
    from fake_servers import FakeServer

    picks = [QUESTIONS[0], next(q for q in QUESTIONS if q[2] == "grep")]
    records = []
    for mode in modes:
        for fault in FAULT_MODES:
            for question in picks:
                policy = FaultyPolicy(question, fault)
                server = FakeServer(policy)
                crashed = None
                out = None
                with server:
                    client = OpenAIClient("eval-key", server.url)
                    try:
                        out = ask_agent(
                            files, question[3], model, client, "policy-llm",
                            max_iterations=20,
                            workspace_name="agent-eval", api_mode=mode,
                        )
                        crashed = False
                    except Exception as e:  # the gate: must never happen
                        crashed = True
                        crash_repr = repr(e)
                rec = {
                    "fault": fault, "question": question[0],
                    "api_mode": mode.value, "crashed": crashed,
                }
                if crashed:
                    rec["error"] = crash_repr
                    records.append(rec)
                    continue
                first_out = next(
                    (e[1] for e in policy.log if e[0] == "tool_output"), ""
                )
                if fault in ("malformed_json", "unknown_tool",
                             "missing_param"):
                    s = score_answer(out.response, question, TOPICS_G[0],
                                     TOPICS_G[1])
                    rec["error_fed_back"] = first_out.startswith("Error:")
                    rec["recovered_answered"] = bool(s["answered"])
                    rec["citation_validity"] = s["citation_validity"]
                    rec["ok"] = rec["error_fed_back"] and rec["recovered_answered"]
                elif fault == "no_citations":
                    s = score_answer(out.response, question, TOPICS_G[0],
                                     TOPICS_G[1])
                    rec["scored_unanswered"] = not s["answered"]
                    rec["ok"] = rec["scored_unanswered"]
                else:  # stall
                    rec["max_iterations_message"] = out.response
                    rec["ok"] = out.response == (
                        "Max iterations (20) reached without final response"
                    )
                records.append(rec)
    return records


TOPICS_G = [None, None]  # (topic_banks, truth) installed by main()


# -- the independent scorer --------------------------------------------------


def _spec_lines(spec: str):
    """Line indices named by a reference spec (single / a-b range /
    scattered a,b,c), in the tools' 0-based convention."""
    if "-" in spec:
        a, b = spec.split("-")
        return list(range(int(a), int(b)))
    return [int(x) for x in spec.split(",")]


def score_answer(answer: str, question, topic_banks, truth) -> dict:
    qid, family, kind, query, topics = question
    body = answer.split("## References")[0]
    markers = set(MARKER_RE.findall(body))
    refs = {m.group(1): (m.group(2), m.group(3))
            for m in REF_RE.finditer(answer)}
    structural = bool(refs) and markers == set(refs)

    if kind == "grep":
        def supports(path, idx, line):
            return query in line
    else:
        bank = set()
        relevant_pids = set()
        for t in topics:
            bank |= set(topic_banks[t])
            relevant_pids |= set(truth[t])

        def supports(path, idx, line):
            # A citation checks out when the cited line is one of the
            # question's topic-bank sentences, or it is the TITLE line
            # (index 0) of a paper the ground truth marks relevant — a
            # title like "A Study of Medical Imaging Methods" supports a
            # medical-imaging claim without being a bank sentence.
            if line in bank:
                return True
            return idx == 0 and Path(path).stem in relevant_pids

    checked = []
    for n, (f, spec) in refs.items():
        ok = False
        try:
            lines = Path(f).read_text().splitlines()
            idxs = _spec_lines(spec)
            ok = all(0 <= i < len(lines) for i in idxs) and any(
                supports(f, i, lines[i]) for i in idxs
            )
        except (OSError, ValueError):
            ok = False
        checked.append(ok)
    n_valid = sum(checked)
    return {
        "question": qid, "family": family, "kind": kind,
        "citations": len(refs), "citations_valid": n_valid,
        "citation_validity": n_valid / max(len(refs), 1),
        "structural_ok": structural,
        "answered": structural and n_valid > 0,
    }


# -- the run ------------------------------------------------------------------


def transcript(question, policy, result, mode) -> str:
    qid, family, kind, query, _ = question
    lines = [
        f"# question {qid} ({family}, {kind}) — api mode: {mode}",
        f"Q: {query}",
        "",
    ]
    for entry in policy.log:
        if entry[0] == "tool_call":
            lines.append(f"[Tool Call: {entry[1]}] {json.dumps(entry[2])}")
        elif entry[0] == "tool_output":
            lines.append("[Tool Output]")
            lines.extend("  " + ln for ln in entry[1].splitlines())
        else:
            lines.append("")
            lines.append(entry[1])
    lines += [
        "",
        f"# scoring: citations {result['citations_valid']}/{result['citations']}"
        f" valid; answered={result['answered']}",
    ]
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--papers", type=int, default=400)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    here = Path(__file__).parent
    out_path = Path(args.out) if args.out else here / "RESULTS_AGENT.json"
    home = tempfile.mkdtemp(prefix="semtools_agent_home_")
    os.environ["HOME"] = home
    os.environ.setdefault("SEMTOOLS_TPU_SHARDED", "0")
    os.environ.setdefault("SEMTOOLS_TPU_DAEMON", "off")

    from gen_text_corpus import TOPICS, gen

    corpus_root = Path(tempfile.mkdtemp(prefix="semtools_agent_corpus_"))
    truth = gen(corpus_root, n_papers=args.papers)

    from semtools_tpu.utils.platform import configure_jax

    configure_jax()
    from fake_servers import FakeServer
    from semtools_tpu.ask.agent import ask_agent
    from semtools_tpu.ask.config import ApiMode
    from semtools_tpu.ask.openai_client import OpenAIClient
    from semtools_tpu.models.static_model import load_model
    from semtools_tpu.store import Workspace

    files = sorted(str(p) for p in (corpus_root / "full_text").glob("*.txt"))
    # Standing real-model hook: load_model resolves real model2vec
    # artifacts when present (local HF cache, SEMTOOLS_TPU_MODEL_DIR, or
    # a first-run hub fetch on a networked host) and the acquisition
    # record below says which path this run actually took — so the
    # moment any networked environment re-runs this eval, the real-model
    # rows fill in with zero code changes (benchmarks/README.md).
    from run_retrieval_eval import attempt_model_acquisition

    acquisition = attempt_model_acquisition()
    model = load_model()
    os.environ["SEMTOOLS_WORKSPACE"] = "agent-eval"
    Workspace.open("agent-eval").save()

    results = []
    t_start = time.perf_counter()
    for mode in (ApiMode.RESPONSES, ApiMode.CHAT):
        mode_dir = here / "answers" / mode.value
        mode_dir.mkdir(parents=True, exist_ok=True)
        for question in QUESTIONS:
            policy = PolicyLLM(question)
            server = FakeServer(policy)
            with server:
                client = OpenAIClient("eval-key", server.url)
                t0 = time.perf_counter()
                out = ask_agent(
                    files, question[3], model, client, "policy-llm",
                    max_iterations=20, workspace_name="agent-eval",
                    api_mode=mode,
                )
                dt = time.perf_counter() - t0
            r = score_answer(out.response, question, TOPICS, truth)
            r.update({
                "api_mode": mode.value,
                "tool_calls": sum(1 for e in policy.log if e[0] == "tool_call"),
                "files_searched": len(out.files_searched),
                "seconds": dt,
            })
            results.append(r)
            (mode_dir / f"{question[0]}.txt").write_text(
                transcript(question, policy, r, mode.value)
            )
            print(json.dumps(r))

    TOPICS_G[0], TOPICS_G[1] = TOPICS, truth
    faults = run_fault_injection(files, model, (ApiMode.RESPONSES, ApiMode.CHAT))
    for r in faults:
        print(json.dumps(r))

    agg = {
        "questions": len(QUESTIONS),
        "api_modes": 2,
        "papers": args.papers,
        "model": getattr(model, "name", "unknown"),
        "total_citations": sum(r["citations"] for r in results),
        "total_citations_valid": sum(r["citations_valid"] for r in results),
        "citation_validity": (
            sum(r["citations_valid"] for r in results)
            / max(sum(r["citations"] for r in results), 1)
        ),
        "answered": sum(r["answered"] for r in results),
        "fault_injection_runs": len(faults),
        "fault_injection_crashes": sum(1 for r in faults if r["crashed"]),
        "fault_injection_ok": sum(1 for r in faults if r.get("ok")),
        "wall_seconds": time.perf_counter() - t_start,
        "model_acquisition": acquisition,
    }
    out_path.write_text(json.dumps(
        {"aggregate": agg, "per_question": results,
         "fault_injection": faults}, indent=1
    ) + "\n")
    print(json.dumps({"aggregate": agg}))


if __name__ == "__main__":
    main()
