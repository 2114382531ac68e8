"""Shared build-and-load helper for the native C++ bindings.

Both ctypes bindings (`data/native_csv.py`, `data/streaming.py`) compile
their .cpp next to the source on first use and degrade gracefully when
the toolchain is unavailable; this is the single place that owns the
compiler invocation and staleness check so flag changes cannot drift
between them.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Callable, Dict, Optional

_LOCK = threading.Lock()
#: src path -> loaded library, or None once a build has failed
_CACHE: Dict[pathlib.Path, Optional[ctypes.CDLL]] = {}


def _compile(src: pathlib.Path, so: pathlib.Path) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", str(src), "-o", str(so),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_native(src: pathlib.Path,
                configure: Callable[[ctypes.CDLL], None]
                ) -> Optional[ctypes.CDLL]:
    """Build (if stale) and dlopen `src`; `configure` sets the restype/
    argtypes. Returns None when the toolchain or build is unavailable —
    callers fall back to their pure-python path. Failures are cached so
    a missing compiler is probed once per process."""
    with _LOCK:
        if src in _CACHE:
            return _CACHE[src]
        so = src.with_suffix(".so")
        lib: Optional[ctypes.CDLL] = None
        if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
            lib = ctypes.CDLL(str(so))
        elif _compile(src, so):
            lib = ctypes.CDLL(str(so))
        if lib is not None:
            configure(lib)
        _CACHE[src] = lib
        return lib
