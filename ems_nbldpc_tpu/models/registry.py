"""Named access to parity-check matrices.

The reference ships 26 matrix files under ``matrices/`` (SURVEY.md §2.4).
They are external data assets: the framework reads them from a configurable
directory (``NBLDPC_MATRIX_DIR``, defaulting to the mounted reference copy)
rather than bundling them.  Codes resolve lazily and are cached.
"""
from __future__ import annotations

import functools
import os

from .code import NBCode, load

DEFAULT_DIRS = (
    os.environ.get("NBLDPC_MATRIX_DIR", ""),
    "/root/reference/matrices",
    os.path.join(os.path.dirname(__file__), "..", "..", "matrices"),
)


def matrix_path(name: str) -> str:
    """Resolve a matrix name ('Mat24_N48_M24', 'KN/N576_K480_GF64.txt', ...)."""
    if os.path.exists(name):   # absolute or cwd-relative path
        return name
    for d in DEFAULT_DIRS:
        if not d:
            continue
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
        if os.path.exists(p + ".txt"):
            return p + ".txt"
    raise FileNotFoundError(f"matrix {name!r} not found in {DEFAULT_DIRS}")


@functools.lru_cache(maxsize=None)
def get_code(name: str, fmt: str = "auto") -> NBCode:
    return load(matrix_path(name), fmt=fmt, name=name)


def available(subdir: str = "") -> list:
    out = []
    for d in DEFAULT_DIRS:
        base = os.path.join(d, subdir) if subdir else d
        if d and os.path.isdir(base):
            for f in sorted(os.listdir(base)):
                p = os.path.join(base, f)
                if os.path.isfile(p) and not f.endswith(".gz"):
                    out.append(os.path.join(subdir, f) if subdir else f)
            break
    return out
