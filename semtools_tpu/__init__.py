"""semtools_tpu — a TPU-native semantic document toolkit.

A from-scratch rebuild of the capabilities of run-llama/semtools
(reference: /root/reference, a Rust CLI) as a JAX/XLA/Pallas-first
framework:

- ``semtools parse``   — document parsing via the LlamaParse cloud API with a
  local incremental cache (reference: src/parse/).
- ``semtools search``  — local semantic per-line search: static embeddings +
  dense cosine scan + top-k, run on the TPU MXU (reference: src/search/).
- ``semtools workspace`` — persistent vector store that caches line embeddings
  for incremental re-search of large corpora (reference: src/workspace/).
- ``semtools ask``     — tool-calling LLM agent over grep/search/read tools
  with mandatory file:line citations (reference: src/ask/).

The compute core is redesigned TPU-first rather than translated:

- embedding = batched token-row gather + masked mean + L2 normalize under
  ``jit`` with bucketed static shapes (reference used model2vec-rs on CPU);
- scoring = tiled ``q @ E^T`` matmuls on the MXU plus a fused Pallas
  partial-top-k scan (reference used simsimd per-line cosine on CPU);
- large corpora shard over a 1-D ``jax.sharding.Mesh`` with per-device
  partial top-k merged via all-gather over ICI (reference was single-process).
"""

__version__ = "0.4.0"


def __getattr__(name):
    """Lazy re-exports of the library surface (keeps ``import semtools_tpu``
    light — jax-heavy modules load on first use)."""
    surface = {
        "StaticModel": ("semtools_tpu.models.static_model", "StaticModel"),
        "load_model": ("semtools_tpu.models.static_model", "load_model"),
        "SearchConfig": ("semtools_tpu.search", "SearchConfig"),
        "SearchResult": ("semtools_tpu.search", "SearchResult"),
        "search_files": ("semtools_tpu.search", "search_files"),
        "search_documents": ("semtools_tpu.search", "search_documents"),
        "search_with_workspace": ("semtools_tpu.search", "search_with_workspace"),
        "Store": ("semtools_tpu.store", "Store"),
        "Workspace": ("semtools_tpu.store", "Workspace"),
        "WorkspaceConfig": ("semtools_tpu.store", "WorkspaceConfig"),
        "LlamaParseBackend": ("semtools_tpu.parse", "LlamaParseBackend"),
        "IvfPqIndex": ("semtools_tpu.index.ivf_pq", "IvfPqIndex"),
    }
    if name in surface:
        import importlib

        module, attr = surface[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'semtools_tpu' has no attribute {name!r}")


__all__ = [
    "StaticModel", "load_model", "__version__",
    "SearchConfig", "SearchResult", "search_files", "search_documents",
    "search_with_workspace", "Store", "Workspace", "WorkspaceConfig",
    "LlamaParseBackend", "IvfPqIndex",
]
