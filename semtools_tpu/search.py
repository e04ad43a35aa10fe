"""Semantic per-line search core.

Behavioral contract mirrors the reference's ``src/search/mod.rs``:

- a *document* is a file split into lines; every line is embedded
  independently (truncated at 2048 tokens, mod.rs:69);
- a search scores the query against every line, keeps lines with
  ``distance < max_distance`` (default threshold 100.0 keeps everything,
  mod.rs:88), attaches a context window of ``n_lines`` before/after clamped
  to file bounds (mod.rs:90-91), sorts ascending by distance (stable,
  mod.rs:107), and returns all hits when a threshold was given else the
  top-k (mod.rs:113-119);
- ``ignore_case`` lowercases both query and lines before embedding but
  reports the original text (mod.rs:63-67).

The scoring itself runs on TPU as one batched matmul over the concatenated
corpus (see semtools_tpu.ops.scan) instead of the reference's per-line SIMD
cosine loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from semtools_tpu.models.static_model import StaticModel
from semtools_tpu.ops.scan import cosine_distances, topk_scan
from semtools_tpu.utils.text import read_file_text, split_lines
from semtools_tpu.utils.tracing import stage


class _RowSlice:
    """Lazy view of rows [start, stop) of a shared (device) embedding
    matrix.

    Splitting one batched encode's output into per-document arrays used
    to issue one device slice per document — 100 files = 100 dispatches,
    each paying the full round-trip on remote/tunneled accelerators —
    only for the scan to concatenate them straight back. Documents now
    hold views; :func:`_corpus_of` recognizes contiguous views of one
    parent and hands the scan the parent matrix with ZERO device ops.
    Materialization happens only if a caller actually indexes a single
    document's rows.
    """

    __slots__ = ("parent", "start", "stop")

    def __init__(self, parent, start: int, stop: int):
        self.parent = parent
        self.start = start
        self.stop = stop

    @property
    def shape(self):
        return (self.stop - self.start,) + tuple(self.parent.shape[1:])

    def __len__(self) -> int:
        return self.stop - self.start

    def materialize(self):
        return self.parent[self.start : self.stop]

    def __getitem__(self, idx):
        return self.materialize()[idx]

    def __array__(self, dtype=None, copy=None):
        out = np.asarray(self.materialize())
        return out.astype(dtype) if dtype is not None else out


@dataclass
class Document:
    filename: str
    lines: List[str]
    # [num_lines, dim] float32 unit-or-zero rows; a _RowSlice view of the
    # batched encode's device matrix (host numpy when built via
    # create_documents..(host=True), a plain array when built directly)
    embeddings: "np.ndarray"


@dataclass
class SearchConfig:
    n_lines: int = 3
    top_k: int = 3
    max_distance: Optional[float] = None
    ignore_case: bool = False


@dataclass
class SearchResult:
    filename: str
    lines: List[str]
    start: int  # 0-based, inclusive
    end: int  # 0-based, exclusive
    match_line: int  # 0-based line that matched
    distance: float


def create_document_from_content(
    filename: str, content: str, model: StaticModel, ignore_case: bool
) -> Optional[Document]:
    """Split content into lines and embed each; None for empty content."""
    docs = create_documents_from_contents([(filename, content)], model, ignore_case)
    return docs[0] if docs else None


def create_documents_from_contents(
    items: Sequence[Tuple[str, str]], model: StaticModel, ignore_case: bool,
    host: bool = False,
) -> List[Document]:
    """Batched variant: embed every line of every document in one encode.

    ``host=True`` transfers the whole embedding matrix device->host ONCE
    and slices in numpy — for callers that need host data per document
    (the store upsert path), where per-doc conversion would pay one
    transfer round-trip per file.

    One device dispatch per token-budget bucket instead of one per file —
    on hosts with per-dispatch latency (remote/tunneled accelerators) this
    is the difference between O(files) and O(1) round-trips. Documents
    with no lines are dropped (reference returns None for them,
    src/search/mod.rs:49-58).
    """
    per_doc_lines: List[Tuple[str, List[str]]] = []
    all_lines: List[str] = []
    for filename, content in items:
        lines = split_lines(content)
        if not lines:
            continue
        per_doc_lines.append((filename, lines))
        all_lines.extend(lines)
    if not per_doc_lines:
        return []
    to_embed = [ln.lower() for ln in all_lines] if ignore_case else all_lines
    with stage("embed"):
        # host=True pipelines the chunked device->host copies with later
        # chunks' flatten work (ops/embed.py) instead of end-loading one
        # blocking transfer of the whole corpus. Only passed when set, so
        # duck-typed models without the kwarg keep working.
        if host:
            try:
                embeddings = model.encode(to_embed, max_length=2048, host=True)
            except TypeError:
                embeddings = model.encode(to_embed, max_length=2048)
        else:
            embeddings = model.encode(to_embed, max_length=2048)
    if host and not isinstance(embeddings, np.ndarray):
        with stage("host_transfer"):  # fallback models without host=
            embeddings = np.asarray(embeddings)
    host_rows = isinstance(embeddings, np.ndarray)
    docs: List[Document] = []
    offset = 0
    for filename, lines in per_doc_lines:
        docs.append(Document(
            filename=filename,
            lines=lines,
            # numpy slices are free views; device arrays get a lazy
            # _RowSlice so the split issues no per-document dispatches
            embeddings=embeddings[offset:offset + len(lines)] if host_rows
            else _RowSlice(embeddings, offset, offset + len(lines)),
        ))
        offset += len(lines)
    return docs


def _result_for_line(
    doc: Document, line_idx: int, distance: float, n_lines: int
) -> SearchResult:
    start = max(0, line_idx - n_lines)
    end = min(len(doc.lines), line_idx + n_lines + 1)
    return SearchResult(
        filename=doc.filename,
        lines=doc.lines[start:end],
        start=start,
        end=end,
        match_line=line_idx,
        distance=float(distance),
    )


def _corpus_of(documents: Sequence[Document]) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """Concatenate doc embeddings; map flat row -> (doc index, line index).

    Embeddings may be device arrays (they usually are — the embed op keeps
    its output on device); concatenation then happens on device and the
    scan consumes it without a host round-trip.
    """
    mats = [d.embeddings for d in documents if len(d.lines)]
    owners: List[Tuple[int, int]] = []
    for di, d in enumerate(documents):
        owners.extend((di, li) for li in range(len(d.lines)))
    if not mats:
        dim = documents[0].embeddings.shape[1] if documents else 0
        return np.zeros((0, dim), np.float32), owners

    # Contiguous views of one batched-encode matrix: hand the scan the
    # parent directly — zero device ops instead of one slice per document
    # plus a concatenate (each a full dispatch round-trip on tunneled
    # accelerators).
    if all(isinstance(m, _RowSlice) for m in mats):
        parent = mats[0].parent
        if all(m.parent is parent for m in mats) and all(
            a.stop == b.start for a, b in zip(mats, mats[1:])
        ):
            if mats[0].start == 0 and mats[-1].stop == parent.shape[0]:
                return parent, owners
            return parent[mats[0].start : mats[-1].stop], owners
    mats = [m.materialize() if isinstance(m, _RowSlice) else m for m in mats]

    if len(mats) == 1:
        return mats[0], owners
    try:
        import jax

        if isinstance(mats[0], jax.Array):
            import jax.numpy as jnp

            return jnp.concatenate(mats, axis=0), owners
    except ImportError:
        pass
    return np.concatenate(mats, axis=0), owners


def search_documents(
    documents: Sequence[Document],
    query_embedding: np.ndarray,
    config: SearchConfig,
) -> List[SearchResult]:
    """Single-query scan — a batch of one through
    :func:`search_documents_batched` (one tier dispatch to maintain)."""
    q = np.asarray(query_embedding, dtype=np.float32).reshape(1, -1)
    per = search_documents_batched(documents, q, config)
    return per[0] if per else []


def search_documents_batched(
    documents: Sequence[Document],
    query_embeddings: np.ndarray,
    config: SearchConfig,
) -> List[List[SearchResult]]:
    """Batched :func:`search_documents`: Q query rows against the same
    corpus in O(1) device dispatches (the top-k scans are query-batched;
    threshold mode uses the batched collection paths). Per-query results
    match the single-query function — threshold overrides top-k with an
    unbounded hit count (mod.rs:113-119)."""
    qs = np.asarray(query_embeddings, np.float32)
    if qs.ndim == 1:
        qs = qs[None]
    qn = int(qs.shape[0])
    if not documents or qn == 0:
        return [[] for _ in range(qn)]
    corpus, owners = _corpus_of(documents)
    if corpus.shape[0] == 0:
        return [[] for _ in range(qn)]

    with stage("scan"):
        from semtools_tpu.store.store import _sharded_enabled

        if _sharded_enabled(int(corpus.shape[0])):
            if config.max_distance is not None:
                from semtools_tpu.parallel.scan import (
                    sharded_batched_threshold_scan,
                )

                per = sharded_batched_threshold_scan(
                    qs, corpus, float(config.max_distance)
                )
            else:
                from semtools_tpu.parallel.scan import sharded_topk_scan

                d, i = sharded_topk_scan(qs, corpus, config.top_k)
                per = list(zip(d, i))
        elif config.max_distance is not None:
            from semtools_tpu.ops.scan import batched_threshold_scan

            per = batched_threshold_scan(qs, corpus, float(config.max_distance))
        else:
            d, i = topk_scan(qs, corpus, config.top_k)
            per = list(zip(d, i))

    out: List[List[SearchResult]] = []
    for dists, idxs in per:
        results = []
        for dist, flat in zip(dists, idxs):
            di, li = owners[int(flat)]
            results.append(
                _result_for_line(documents[di], li, dist, config.n_lines)
            )
        out.append(results)
    return out


def search_files(
    files: Sequence[str],
    query: str,
    model: StaticModel,
    config: SearchConfig,
) -> List[SearchResult]:
    """Read, embed, and search files. IO errors propagate (reference mod.rs:130)."""
    with stage("read_files"):
        contents = [(f, read_file_text(f)) for f in files]
    documents = create_documents_from_contents(contents, model, config.ignore_case)

    query_text = query.lower() if config.ignore_case else query
    query_embedding = model.encode_single(query_text)
    return search_documents(documents, query_embedding, config)


def _encode_queries(
    queries: Sequence[str], model: StaticModel, config: SearchConfig
) -> np.ndarray:
    """Embed Q query strings in ONE encode call (not Q encode_single
    round-trips); lowercases first under ignore_case (mod.rs:63-67)."""
    texts = [q.lower() for q in queries] if config.ignore_case else list(queries)
    return np.asarray(model.encode(texts, max_length=2048), np.float32)


def search_files_batched(
    files: Sequence[str],
    queries: Sequence[str],
    model: StaticModel,
    config: SearchConfig,
) -> List[List[SearchResult]]:
    """Batched :func:`search_files`: embed the corpus once, embed all
    queries in one encode, scan in O(1) dispatches."""
    if not queries:
        return []
    with stage("read_files"):
        contents = [(f, read_file_text(f)) for f in files]
    documents = create_documents_from_contents(contents, model, config.ignore_case)
    return search_documents_batched(
        documents, _encode_queries(queries, model, config), config
    )


def search_with_workspace(
    files: Sequence[str],
    query: str,
    model: StaticModel,
    config: SearchConfig,
    workspace_name: Optional[str] = None,
):
    """Workspace-backed search with incremental re-embedding.

    Mirrors the reference flow (src/search/mod.rs:146-211): classify files
    as new/changed/unchanged via size+mtime+version, re-embed only
    new/changed files, upsert, then run the filtered store scan. Returns
    ``List[RankedLine]`` — (path, line_number, distance) only; context text
    is re-read from the live file at print time (src/cmds/search.rs:66-110).
    """
    from semtools_tpu.store import Store, Workspace

    query_embedding = model.encode_single(query)
    ws = Workspace.open(workspace_name)
    store = Store(ws.config.root_dir, dim=model.dim, model_name=model.name)
    _workspace_update(files, model, config, store)

    with stage("store_scan"):
        ranked = store.search_line_embeddings(
            query_embedding, list(files), config.top_k, config.max_distance
        )
    store.close()
    return ranked


def _workspace_update(files, model, config, store) -> None:
    """The incremental re-embed + upsert + ANN-refresh flow shared by the
    single-query and batched workspace searches (src/search/mod.rs:164-207).

    LINE-LEVEL REUSE: a changed file re-embeds only the lines whose
    content hash is not already present in its stored block (the store's
    ``lines.h64`` sidecar) — a 1-line edit to a 50k-line file embeds one
    line, not 50k. Embeddings depend only on the (case-folded) text, so
    a hash hit can copy the stored f32 row verbatim; duplicate novel
    lines across the whole batch embed once. Reuse is disabled when the
    stored rows predate the current embedding version or model (the
    store marks those docs version-mismatched)."""
    import sys

    from semtools_tpu.store.store import CURRENT_EMBEDDING_VERSION
    from semtools_tpu.utils.hashing import line_content_hash

    states = store.analyze_document_states(files)

    lines_upserted = 0
    lines_reused = 0
    unique_new = 0
    metas = []
    dirty = [s2.info for s2 in states if s2.kind in ("changed", "new")]
    if dirty:
        plan = []  # (info, texts-to-embed hashes, per-doc old rows-by-hash)
        novel: dict = {}  # hash -> text, first occurrence across the batch
        for info in dirty:
            lines = split_lines(info.content)
            if not lines:
                continue  # empty docs are skipped (reference returns None)
            texts = [ln.lower() for ln in lines] if config.ignore_case else lines
            hashes = [line_content_hash(t) for t in texts]
            old_rows: dict = {}
            if info.prev_version == CURRENT_EMBEDDING_VERSION:
                old = store.get_doc_hash_rows(info.filename)
                if old is not None:
                    oh, orows = old
                    for j, h in enumerate(oh.tolist()):
                        if h and h not in old_rows:
                            old_rows[h] = orows[j]
            for h, t in zip(hashes, texts):
                if h not in old_rows and h not in novel:
                    novel[h] = t
            plan.append((info, hashes, old_rows))

        novel_rows: dict = {}
        unique_new = len(novel)
        if novel:
            texts = list(novel.values())
            with stage("embed"):
                try:
                    rows = model.encode(texts, max_length=2048, host=True)
                except TypeError:
                    rows = model.encode(texts, max_length=2048)
            rows = np.asarray(rows, np.float32)
            novel_rows = dict(zip(novel.keys(), rows))

        bulk = []
        for info, hashes, old_rows in plan:
            mat = np.stack([
                old_rows[h] if h in old_rows else novel_rows[h] for h in hashes
            ]).astype(np.float32, copy=False)
            bulk.append((
                info.filename, mat, np.array(hashes, np.uint64)
            ))
            lines_upserted += len(hashes)
            lines_reused += sum(1 for h in hashes if h in old_rows)
            metas.append(info.meta)
        with stage("store_upsert"):
            store.upsert_documents_bulk(bulk)

    if lines_upserted:
        print(
            f"Updating workspace with {lines_upserted} lines from new/changed docs...",
            file=sys.stderr,
        )
        if lines_reused:
            print(
                f"  (reused {lines_reused} cached line embeddings; "
                f"embedded {unique_new} unique new lines)",
                file=sys.stderr,
            )
    if metas:
        print(
            f"Updating workspace with {len(metas)} new/changed documents...",
            file=sys.stderr,
        )
        store.upsert_document_metadata(metas)

    # Refresh the IVF-PQ capacity tier when the corpus is too big for the
    # exact device tiers (no-op otherwise or when already fresh).
    with stage("ann_build"):
        store.build_ann_index(verbose=True)


def search_with_workspace_batched(
    files: Sequence[str],
    queries: Sequence[str],
    model: StaticModel,
    config: SearchConfig,
    workspace_name: Optional[str] = None,
):
    """Batched :func:`search_with_workspace`: one incremental update, all
    queries embedded in one encode, one batched store scan. Returns
    ``List[List[RankedLine]]`` in query order."""
    from semtools_tpu.store import Store, Workspace

    if not queries:
        return []
    qs = _encode_queries(queries, model, config)
    ws = Workspace.open(workspace_name)
    store = Store(ws.config.root_dir, dim=model.dim, model_name=model.name)
    _workspace_update(files, model, config, store)

    with stage("store_scan"):
        ranked = store.search_line_embeddings_batched(
            qs, list(files), config.top_k, config.max_distance
        )
    store.close()
    return ranked


def query_distances(
    query_embedding: np.ndarray, embeddings: np.ndarray
) -> np.ndarray:
    """Distances of one query against an [N, D] matrix (test/bench helper)."""
    q = np.asarray(query_embedding, dtype=np.float32).reshape(1, -1)
    return np.asarray(cosine_distances(q, embeddings))[0]
