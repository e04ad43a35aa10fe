"""ctypes interface to the native grep scanner (cpp/grepscan.cpp).

The reference backs its grep tool with the ripgrep engine crates
(src/ask/tools.rs:434-553); here the native scanner lives in the shared
runtime library loaded by :mod:`semtools_tpu.utils.native`, with a pure
Python ``re`` fallback in semtools_tpu.ask.tools when the library is
unavailable.
"""

from __future__ import annotations

import ctypes
from typing import List

from semtools_tpu.utils import native


def available() -> bool:
    return native.available()


def match_lines(path: str, pattern: str, ignore_case: bool) -> List[int]:
    """0-based indices of lines matching ``pattern`` in ``path``.

    Raises ValueError on scanner errors (unreadable file, bad pattern);
    callers catch and fall back to the Python implementation.
    """
    lib = native.load()
    assert lib is not None, "native library not built"
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
