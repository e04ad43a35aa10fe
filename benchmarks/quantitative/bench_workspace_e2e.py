"""End-to-end workspace build at scale through the REAL product pipeline.

Unlike bench_patch_scale.py (synthetic vectors straight into the Store),
this drives `search_with_workspace` — tokenize -> device embed -> upsert
-> tier policy -> device scan — over a generated-text corpus with the
genuine model2vec fixture artifacts (tests/fixtures/potion_mini), i.e.
the same code path a user's first `semtools search` over a large corpus
takes.

Measures: cold build (classify + tokenize + embed + upsert) wall time
and lines/s, warm query latency, and a single-file incremental update.

    python benchmarks/quantitative/bench_workspace_e2e.py [n_papers]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

REPO = Path(__file__).resolve().parents[2]


from semtools_tpu.utils.platform import configure_jax

configure_jax()  # persistent compile cache: tunnel compiles are the slow part


def main() -> None:
    n_papers = int(sys.argv[1]) if len(sys.argv) > 1 else 8000

    tmp = Path(tempfile.mkdtemp(prefix="ws_e2e_"))
    os.environ["HOME"] = str(tmp)  # isolate ~/.semtools
    os.environ.setdefault(
        "SEMTOOLS_TPU_MODEL_DIR", str(REPO / "tests" / "fixtures" / "potion_mini")
    )

    sys.path.insert(0, str(REPO / "benchmarks" / "arxiv"))
    from gen_text_corpus import gen

    corpus_root = tmp / "corpus"
    t0 = time.perf_counter()
    gen(corpus_root, n_papers=n_papers, seed=7)
    gen_s = time.perf_counter() - t0
    files = sorted(str(p) for p in (corpus_root / "full_text").glob("*.txt"))
    total_lines = sum(1 for f in files for _ in open(f))

    from semtools_tpu.models.static_model import StaticModel
    from semtools_tpu.search import SearchConfig, search_with_workspace
    from semtools_tpu.store import Workspace, WorkspaceConfig

    model = StaticModel.from_pretrained(os.environ["SEMTOOLS_TPU_MODEL_DIR"])
    ws = Workspace(WorkspaceConfig(name="e2e", root_dir=Workspace.root_path("e2e")))
    ws.save()
    cfg = SearchConfig(top_k=5, n_lines=2)

    t0 = time.perf_counter()
    hits = search_with_workspace(files, "denoising diffusion noise schedule",
                                 model, cfg, workspace_name="e2e")
    build_s = time.perf_counter() - t0
    assert hits, "no hits from cold build"

    t0 = time.perf_counter()
    hits_warm = search_with_workspace(files, "attention mechanisms weigh context",
                                      model, cfg, workspace_name="e2e")
    warm_s = time.perf_counter() - t0
    assert hits_warm, "no warm hits"

    # incremental: rewrite ONE file, re-search — only that file re-embeds
    target = Path(files[17])
    target.write_text("a fresh unique sentinel about zebra calibration\n" * 30)
    t0 = time.perf_counter()
    hits_inc = search_with_workspace(files, "zebra calibration sentinel",
                                     model, cfg, workspace_name="e2e")
    inc_s = time.perf_counter() - t0
    assert hits_inc and hits_inc[0].path == str(target), hits_inc[:1]

    print(json.dumps({
        "config": "workspace_e2e_realpipeline",
        "papers": len(files),
        "total_lines": total_lines,
        "model": "potion_mini fixture (real model2vec artifacts)",
        "corpus_gen_s": round(gen_s, 1),
        "cold_build_and_query_s": round(build_s, 1),
        "build_lines_per_s": round(total_lines / build_s, 1),
        "warm_query_s": round(warm_s, 2),
        "one_file_update_query_s": round(inc_s, 2),
    }))


if __name__ == "__main__":
    main()
