from semtools_tpu.store.workspace import NoActiveWorkspace, Workspace, WorkspaceConfig
from semtools_tpu.store.store import (
    CURRENT_EMBEDDING_VERSION,
    DocMeta,
    DocumentInfo,
    DocumentState,
    LineEmbedding,
    RankedLine,
    Store,
    WorkspaceStats,
)

__all__ = [
    "NoActiveWorkspace",
    "Workspace",
    "WorkspaceConfig",
    "Store",
    "DocMeta",
    "DocumentInfo",
    "DocumentState",
    "LineEmbedding",
    "RankedLine",
    "WorkspaceStats",
    "CURRENT_EMBEDDING_VERSION",
]
