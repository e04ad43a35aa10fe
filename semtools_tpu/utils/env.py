"""Environment-variable parsing shared across modules."""

from __future__ import annotations

import os


def env_int(name: str, default: int) -> int:
    """Integer env var with a default; malformed values fall back."""
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default
