"""ctypes bindings for the native grep scanner (cpp/grepscan.cpp).

The reference backs its grep tool with the ripgrep engine crates
(src/ask/tools.rs:434-553); here the native scanner is a C++ shared library
loaded via ctypes, with a pure-Python ``re`` fallback in
semtools_tpu.ask.tools when the library has not been built.
"""

from __future__ import annotations

import ctypes
import sys
from pathlib import Path
from typing import List, Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> Path:
    suffix = ".dylib" if sys.platform == "darwin" else ".so"
    return Path(__file__).resolve().parent.parent / "_native" / f"libgrepscan{suffix}"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not path.exists():
        return None
    try:
        lib = ctypes.CDLL(str(path))
        lib.grepscan_match_lines.restype = ctypes.c_longlong
        lib.grepscan_match_lines.argtypes = [
            ctypes.c_char_p,  # file path
            ctypes.c_char_p,  # pattern (ECMAScript regex)
            ctypes.c_int,  # ignore_case
            ctypes.POINTER(ctypes.c_longlong),  # out buffer
            ctypes.c_longlong,  # out capacity
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def match_lines(path: str, pattern: str, ignore_case: bool) -> List[int]:
    """0-based indices of lines matching ``pattern`` in ``path``."""
    lib = _load()
    assert lib is not None, "native grepscan not built"
    cap = 1 << 16
    while True:
        buf = (ctypes.c_longlong * cap)()
        n = lib.grepscan_match_lines(
            path.encode(), pattern.encode(), 1 if ignore_case else 0, buf, cap
        )
        if n < 0:
            raise ValueError(f"grepscan failed on {path} (code {n})")
        if n <= cap:
            return [buf[i] for i in range(n)]
        cap = n  # retry with exact capacity
