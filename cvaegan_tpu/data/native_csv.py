"""ctypes binding for the native C++ CSV parser.

Builds `cvaegan_tpu/native/csv_loader.cpp` with g++ on first use (cached
next to the source) and exposes `load_csv_native(path)`. Semantics match
the pandas loader exactly (headerless, coerce-to-numeric, NaN/garbage ->
0.0, reference `src/datasets/__init__.py:11-17`); `cvaegan_tpu.data.
tabular.load_csv` prefers this path and falls back to pandas when the
toolchain or the parse is unavailable.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = pathlib.Path(__file__).resolve().parent.parent / "native" / "csv_loader.cpp"
_SO = _SRC.with_suffix(".so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build() -> Optional[ctypes.CDLL]:
    global _BUILD_FAILED
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-pthread", str(_SRC), "-o", str(_SO),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            _BUILD_FAILED = True
            return None
    lib = ctypes.CDLL(str(_SO))
    lib.csv_dims.restype = ctypes.c_int
    lib.csv_dims.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.csv_parse.restype = ctypes.c_int
    lib.csv_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None and not _BUILD_FAILED:
        with _LOCK:
            if _LIB is None and not _BUILD_FAILED:
                _LIB = _build()
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def load_csv_native(file_path) -> np.ndarray:
    """Parse a headerless CSV into float32 [rows, cols]; raises
    RuntimeError when the native library is unavailable or parsing fails
    (callers fall back to pandas)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native CSV parser unavailable")
    path = str(file_path).encode()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    if lib.csv_dims(path, ctypes.byref(rows), ctypes.byref(cols)) != 0:
        raise RuntimeError(f"csv_dims failed for {file_path}")
    out = np.empty((rows.value, cols.value), dtype=np.float32)
    rc = lib.csv_parse(
        path,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size,
        ctypes.byref(rows),
        ctypes.byref(cols),
    )
    if rc != 0:
        raise RuntimeError(f"csv_parse failed ({rc}) for {file_path}")
    return out
