"""Loader for the native runtime library (cpp/ -> _native/libsemtools_native.so).

The reference's performance-sensitive host code is native (ripgrep engine
crates for grep, Rust tokenizers for tokenization). This build keeps that
property with a single C++ shared library holding:

- ``grepscan_match_lines`` — the ask agent's grep scanner (cpp/grepscan.cpp)
- ``hashtok_encode_batch`` — hashed-tokenizer fast path (cpp/hashtok.cpp)
- ``adc_scan_lists`` — IVF-PQ probe scan for the ANN serving tier
  (cpp/adcscan.cpp)

Loading is lazy and resilient: if the library is missing, the loader
attempts a one-shot quiet build with ``make`` (disable by setting
``SEMTOOLS_TPU_NO_NATIVE_BUILD=1``); on any failure callers fall back to
their pure-Python implementations, so the framework never hard-requires a
toolchain at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_PKG_DIR = Path(__file__).resolve().parent.parent


def lib_path() -> Path:
    if sys.platform == "darwin":
        suffix = ".dylib"
    elif os.name == "nt":
        # No Windows build target yet: the path simply never exists, so
        # available() is False and every native consumer takes its pure
        # Python fallback (grep -> re, tokenizer -> host hashing).
        suffix = ".dll"
    else:
        suffix = ".so"
    return _PKG_DIR / "_native" / f"libsemtools_native{suffix}"


def _try_build() -> bool:
    if os.environ.get("SEMTOOLS_TPU_NO_NATIVE_BUILD"):
        return False
    cpp_dir = _PKG_DIR.parent / "cpp"
    if not (cpp_dir / "Makefile").exists():
        return False
    # A stale .so from an older source tree may predate newly added
    # symbols; `make` only relinks when a source is newer, so touching
    # nothing here is safe — the caller retries the bind after a build.
    try:
        proc = subprocess.run(
            ["make", "-C", str(cpp_dir)],
            capture_output=True,
            timeout=120,
        )
    except (OSError, subprocess.TimeoutExpired):
        return False
    return proc.returncode == 0 and lib_path().exists()


def _bind(lib: ctypes.CDLL) -> None:
    lib.grepscan_match_lines.restype = ctypes.c_longlong
    lib.grepscan_match_lines.argtypes = [
        ctypes.c_char_p,  # file path
        ctypes.c_char_p,  # pattern
        ctypes.c_int,  # ignore_case
        ctypes.POINTER(ctypes.c_longlong),  # out line indices
        ctypes.c_longlong,  # out capacity
    ]
    lib.hashtok_encode_batch.restype = ctypes.c_longlong
    lib.hashtok_encode_batch.argtypes = [
        ctypes.c_char_p,  # concatenated texts
        ctypes.POINTER(ctypes.c_longlong),  # text offsets [n+1]
        ctypes.c_longlong,  # n_texts
        ctypes.c_longlong,  # vocab size
        ctypes.c_int,  # ngram_min
        ctypes.c_int,  # ngram_max
        ctypes.POINTER(ctypes.c_uint32),  # out ids
        ctypes.c_longlong,  # out capacity
        ctypes.POINTER(ctypes.c_longlong),  # out per-text offsets [n+1]
    ]
    # Newer symbol than grepscan/hashtok: bind leniently so a stale .so on
    # a host without a toolchain still serves the older fast paths.
    if not hasattr(lib, "adc_scan_lists"):
        return
    lib.adc_scan_lists.restype = ctypes.c_longlong
    lib.adc_scan_lists.argtypes = [
        ctypes.c_void_p,  # codes [n_total, m] uint8
        ctypes.c_longlong,  # m
        ctypes.c_void_p,  # table [m, 256] f32
        ctypes.c_void_p,  # starts [n_lists] i64
        ctypes.c_void_p,  # ends [n_lists] i64
        ctypes.c_void_p,  # bias [n_lists] f32
        ctypes.c_longlong,  # n_lists
        ctypes.c_void_p,  # out scores [cap] f32
        ctypes.c_void_p,  # out rows [cap] i64
        ctypes.c_longlong,  # cap
    ]


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use if possible."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = lib_path()
    if path.exists():
        # Rebuild a stale .so BEFORE the first dlopen: a library that
        # predates newly added symbols would fail the bind, and dlopen
        # caches by inode, so rebuilding after a failed load cannot be
        # picked up within this process.
        cpp_dir = _PKG_DIR.parent / "cpp"
        try:
            so_mtime = path.stat().st_mtime
            inputs = []
            if cpp_dir.exists():
                for pat in ("*.cpp", "*.h", "Makefile"):
                    inputs.extend(cpp_dir.glob(pat))
            stale = any(src.stat().st_mtime > so_mtime for src in inputs)
        except OSError:
            stale = False
        if stale:
            _try_build()
    elif not _try_build():
        return None
    try:
        lib = ctypes.CDLL(str(path))
        _bind(lib)
        _LIB = lib
    except (OSError, AttributeError):
        _LIB = None
    return _LIB


def available() -> bool:
    return load() is not None


def adc_lib() -> Optional[ctypes.CDLL]:
    """The library handle iff it carries the ADC scan symbol (a stale
    prebuilt .so may not)."""
    lib = load()
    return lib if lib is not None and hasattr(lib, "adc_scan_lists") else None
