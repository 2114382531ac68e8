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
from typing import Optional

import numpy as np

from cvaegan_tpu.data._native_build import load_native

_SRC = pathlib.Path(__file__).resolve().parent.parent / "native" / "csv_loader.cpp"


def _configure(lib: ctypes.CDLL) -> None:
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


def _get_lib() -> Optional[ctypes.CDLL]:
    return load_native(_SRC, _configure)


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
