"""Static embedding model: tokenizer + embedding table + TPU pooling.

The equivalent of model2vec-rs' ``StaticModel`` (the reference loads
minishlab/potion-multilingual-128M at src/cmds/search.rs:123-128 and encodes
with ``encode_single`` / ``encode_with_args(lines, Some(2048), 16384)``,
src/search/mod.rs:69,138). A static model has no transformer forward pass:
embedding a text is a token-row lookup + mean pool + optional L2 normalize,
which this module runs as a batched JAX program (see
``semtools_tpu.ops.embed``).

Model resolution order for ``StaticModel.from_pretrained(name)``:

1. ``name`` is a local directory with model2vec artifacts
   (``model.safetensors`` + ``tokenizer.json`` [+ ``config.json``]);
2. the ``SEMTOOLS_TPU_MODEL_DIR`` environment variable points at artifacts;
3. the HuggingFace hub cache (``~/.cache/huggingface/hub``) already holds a
   snapshot of ``name``;
4. first-run hub download via ``huggingface_hub`` when it is installed and
   the network is reachable — the same first-use fetch the reference
   performs (src/cmds/search.rs:123-128; model2vec ``from_pretrained``
   with an ``hf_token``). Disable with ``SEMTOOLS_TPU_NO_FETCH=1``;
5. fallback: the built-in deterministic hashed n-gram model
   (:class:`semtools_tpu.models.tokenizer.HashTokenizer` over a seeded
   Gaussian table), so every command still works fully offline — but the
   semantics DEGRADE to surface similarity, so the fallback announces
   itself with a prominent warning (acknowledge with
   ``SEMTOOLS_TPU_ALLOW_FALLBACK=1`` to silence it).
"""

from __future__ import annotations

import glob
import json
import os
import struct
import sys
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from semtools_tpu.models.tokenizer import HashTokenizer, HFTokenizer
from semtools_tpu.ops.embed import embed_token_lists

MODEL_NAME = "minishlab/potion-multilingual-128M"

# Built-in fallback model parameters. Changing any of these invalidates
# stored workspace embeddings — bump semtools_tpu.store CURRENT_EMBEDDING_VERSION.
FALLBACK_DIM = 256
FALLBACK_VOCAB = 1 << 16
FALLBACK_SEED = 0x5EED
FALLBACK_NAME = "semtools-tpu/hashed-ngram-256"


def _read_safetensors(path: str) -> dict:
    """Minimal safetensors reader returning {name: np.ndarray} (mmap-backed)."""
    dtypes = {
        "F64": np.float64,
        "F32": np.float32,
        "F16": np.float16,
        "BF16": None,  # handled specially below
        "I64": np.int64,
        "I32": np.int32,
        "I16": np.int16,
        "I8": np.int8,
        "U8": np.uint8,
        "BOOL": np.bool_,
    }
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len))
    data_start = 8 + header_len
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    out = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        begin, end = info["data_offsets"]
        raw = mm[data_start + begin : data_start + end]
        if info["dtype"] == "BF16":
            u16 = raw.view(np.uint16)
            u32 = u16.astype(np.uint32) << 16
            arr = u32.view(np.float32)
        else:
            arr = raw.view(dtypes[info["dtype"]])
        out[name] = np.asarray(arr).reshape(info["shape"])
    return out


def _find_artifact_dir(name_or_path: str) -> Optional[str]:
    """Locate a model2vec artifact directory without any network access."""
    candidates: List[str] = []
    p = Path(name_or_path).expanduser()
    if p.is_dir():
        candidates.append(str(p))

    env_dir = os.environ.get("SEMTOOLS_TPU_MODEL_DIR")
    if env_dir and Path(env_dir).is_dir():
        candidates.append(env_dir)

    hub = Path(
        os.environ.get("HF_HOME", Path.home() / ".cache" / "huggingface")
    ) / "hub"
    cache_name = "models--" + name_or_path.replace("/", "--")
    snap_root = hub / cache_name / "snapshots"
    if snap_root.is_dir():
        candidates.extend(sorted(glob.glob(str(snap_root / "*"))))

    for cand in candidates:
        if (Path(cand) / "model.safetensors").exists() and (
            Path(cand) / "tokenizer.json"
        ).exists():
            return cand
    return None


def _fetch_from_hub(name: str, hf_token: Optional[str]) -> Optional[str]:
    """First-run hub download (reference parity: model2vec's
    ``from_pretrained`` fetches on first use, src/cmds/search.rs:123-128).

    Returns the local snapshot directory, or None when fetching is
    disabled (``SEMTOOLS_TPU_NO_FETCH=1``), ``name`` is not a hub repo id,
    huggingface_hub is not installed, or the network is unreachable —
    each failure mode is reported once on stderr, never raised.
    """
    if os.environ.get("SEMTOOLS_TPU_NO_FETCH") == "1":
        return None
    if "/" not in name or Path(name).expanduser().is_absolute():
        return None  # a path, not a hub repo id
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        print(
            f"semtools: '{name}' is not cached and huggingface_hub is not "
            "installed; skipping download",
            file=sys.stderr,
        )
        return None
    try:
        print(f"semtools: downloading '{name}' from the HuggingFace hub...",
              file=sys.stderr)
        return snapshot_download(
            repo_id=name,
            token=hf_token,
            allow_patterns=["model.safetensors", "tokenizer.json", "config.json"],
        )
    except Exception as exc:  # offline, auth, missing repo: fall back
        print(
            f"semtools: could not download '{name}' "
            f"({type(exc).__name__}: {exc})",
            file=sys.stderr,
        )
        return None


_FALLBACK_WARNED = [False]


def _warn_fallback(name: str) -> None:
    """One prominent per-process notice that search semantics degraded.

    The round-2 review found the single quiet stderr line too easy to
    miss: a user on a fresh machine would get surface-similarity search
    where the reference gives real semantic search, without noticing.
    ``SEMTOOLS_TPU_ALLOW_FALLBACK=1`` acknowledges the degradation and
    restores the one-line notice.
    """
    if os.environ.get("SEMTOOLS_TPU_ALLOW_FALLBACK") == "1":
        print(
            f"semtools: model '{name}' unavailable; using built-in "
            f"deterministic embedder ({FALLBACK_NAME})",
            file=sys.stderr,
        )
        return
    if _FALLBACK_WARNED[0]:
        return
    _FALLBACK_WARNED[0] = True
    print(
        "\n".join([
            "semtools: " + "=" * 64,
            f"semtools: WARNING: embedding model '{name}' is unavailable.",
            f"semtools: Falling back to the built-in {FALLBACK_NAME}",
            "semtools: embedder: search will match SURFACE similarity",
            "semtools: (shared words/character n-grams), not meaning.",
            "semtools: To restore semantic search, connect to the network",
            "semtools: (the model downloads automatically) or point",
            "semtools: SEMTOOLS_TPU_MODEL_DIR at model2vec artifacts.",
            "semtools: Set SEMTOOLS_TPU_ALLOW_FALLBACK=1 to silence this.",
            "semtools: " + "=" * 64,
        ]),
        file=sys.stderr,
    )


def _fallback_table() -> np.ndarray:
    """Deterministic Gaussian embedding table for the hashed fallback model."""
    rng = np.random.Generator(np.random.Philox(FALLBACK_SEED))
    table = rng.standard_normal((FALLBACK_VOCAB, FALLBACK_DIM), dtype=np.float32)
    table /= np.sqrt(FALLBACK_DIM)
    return table


_MODEL_CACHE: dict = {}
# Concurrent daemon readers may race a cold from_pretrained; the lock
# keeps the artifact read + device table upload single-flight.
_MODEL_CACHE_LOCK = threading.Lock()


class StaticModel:
    """Tokenize on host, pool on TPU.

    ``encode`` / ``encode_single`` mirror the model2vec-rs API surface the
    reference uses (src/search/mod.rs:69,138).
    """

    def __init__(self, table: np.ndarray, tokenizer, *, normalize: bool = True, name: str = ""):
        import jax.numpy as jnp

        self.table_np = np.ascontiguousarray(table, dtype=np.float32)
        self.table = jnp.asarray(self.table_np)  # device-resident for the life of the model
        self.tokenizer = tokenizer
        self.normalize = normalize
        self.name = name
        self.dim = int(table.shape[1])

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        name_or_path: str = MODEL_NAME,
        hf_token: Optional[str] = None,  # forwarded to the hub fetch (private models)
        normalize_override: Optional[bool] = None,
        subfolder: Optional[str] = None,
    ) -> "StaticModel":
        # Process-level memo: long-lived processes (the daemon, test runs)
        # must not re-read artifacts and re-upload the embedding table on
        # every command. Models are immutable after load.
        key = (name_or_path, normalize_override, subfolder)
        with _MODEL_CACHE_LOCK:
            cached = _MODEL_CACHE.get(key)
            if cached is not None:
                return cached
            model = cls._from_pretrained_uncached(
                name_or_path, hf_token=hf_token,
                normalize_override=normalize_override, subfolder=subfolder,
            )
            _MODEL_CACHE[key] = model
            return model

    @classmethod
    def _from_pretrained_uncached(
        cls,
        name_or_path: str,
        hf_token: Optional[str] = None,
        normalize_override: Optional[bool] = None,
        subfolder: Optional[str] = None,
    ) -> "StaticModel":
        target = name_or_path if subfolder is None else str(Path(name_or_path) / subfolder)
        art_dir = _find_artifact_dir(target)
        if art_dir is None:
            fetched = _fetch_from_hub(name_or_path, hf_token)
            if fetched is not None:
                sub = fetched if subfolder is None else str(Path(fetched) / subfolder)
                art_dir = _find_artifact_dir(sub)
        if art_dir is None:
            _warn_fallback(name_or_path)
            return cls.fallback(normalize_override=normalize_override)

        tensors = _read_safetensors(str(Path(art_dir) / "model.safetensors"))
        if "embeddings" in tensors:
            table = tensors["embeddings"]
        else:  # some exports name the single tensor differently
            table = next(iter(tensors.values()))
        tokenizer = HFTokenizer(str(Path(art_dir) / "tokenizer.json"))

        normalize = True
        cfg_path = Path(art_dir) / "config.json"
        if cfg_path.exists():
            cfg = json.loads(cfg_path.read_text())
            normalize = bool(cfg.get("normalize", True))
        if normalize_override is not None:
            normalize = normalize_override

        return cls(np.asarray(table, dtype=np.float32), tokenizer, normalize=normalize, name=target)

    @classmethod
    def fallback(cls, normalize_override: Optional[bool] = None) -> "StaticModel":
        normalize = True if normalize_override is None else normalize_override
        return cls(
            _fallback_table(),
            HashTokenizer(vocab_size=FALLBACK_VOCAB),
            normalize=normalize,
            name=FALLBACK_NAME,
        )

    # -- encoding ----------------------------------------------------------

    def encode(
        self,
        texts: Sequence[str],
        max_length: Optional[int] = 2048,
        batch_size: int = 16384,
        host: bool = False,
    ):
        """Embed a batch of texts → [N, dim] float32 device array.

        Host-side consumers (the store's upsert path) pass ``host=True``
        to get a numpy array whose chunked device→host copies start
        asynchronously and overlap later chunks' tokenize/flatten work —
        on transfer-limited hosts this pipelines the corpus download
        instead of end-loading it. Keeping the default device residency
        lets the scan run without a host round-trip.
        """
        del batch_size  # device-call chunking is handled in ops.embed
        if len(texts) == 0:
            import jax.numpy as jnp

            z = jnp.zeros((0, self.dim), dtype=jnp.float32)
            return np.asarray(z) if host else z
        token_lists = self.tokenizer.encode_batch(texts)
        max_len = max_length if max_length is not None else 1 << 30
        if host:
            # Host-bound consumers (the store mmap) can be served by the
            # CPU embedding-bag path when the measured link makes the
            # device round-trip the bottleneck (ops/host_embed.py;
            # SEMTOOLS_TPU_EMBED=device|host|auto overrides).
            from semtools_tpu.ops.host_embed import (
                choose_host_embed,
                embed_token_lists_host,
            )

            n_tokens = sum(min(len(x), max_len) for x in token_lists)
            if choose_host_embed(self.table_np, len(token_lists), n_tokens):
                from semtools_tpu.utils.tracing import stage

                with stage("embed_host"):
                    return embed_token_lists_host(
                        self.table_np, token_lists,
                        max_length=max_len, normalize=self.normalize,
                    )
            # Device path chosen: guard multi-chunk builds with the
            # first-chunk viability check (the probe is a point sample;
            # the link can degrade mid-build — ops/host_embed.py).
            from semtools_tpu.ops.host_embed import mid_flight_embed

            res = mid_flight_embed(
                self.table, self.table_np, token_lists,
                max_length=max_len, normalize=self.normalize,
            )
            if res is not None:
                return res
        return embed_token_lists(
            self.table,
            token_lists,
            max_length=max_len,
            normalize=self.normalize,
            host=host,
        )

    def encode_single(self, text: str) -> np.ndarray:
        """Embed one text → [dim] float32."""
        return self.encode([text])[0]


def load_model(name_or_path: str = MODEL_NAME) -> StaticModel:
    """Convenience loader used by the CLI (memoized via from_pretrained)."""
    return StaticModel.from_pretrained(name_or_path)
