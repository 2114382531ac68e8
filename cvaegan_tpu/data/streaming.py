"""Streaming CSV ingestion with native background prefetch.

Counterpart to the whole-file loader (`data/tabular.load_csv`) for
corpora that should not be materialized in host memory at once — the
reference's data layer (`src/datasets/__init__.py:11-17`) reads entire
CSVs with pandas; real Car-Hacking-scale captures (millions of frames)
make that the peak-RSS bottleneck. Here a C++ reader thread
(`native/stream_reader.cpp`) parses fixed-size row chunks behind the
consumer, so peak host memory is O(chunk) regardless of file size, and
parsing overlaps with whatever the consumer does next (device upload,
statistics, inference).

Public surface:
  StreamingCSV(path, chunk_rows)   — iterator of float32 [rows, cols]
                                     numpy chunks (native or pandas)
  stream_minmax(path)              — one-pass per-column min/max
  load_csv_streamed(path)          — device-resident jnp array built by
                                     chunked uploads (never holds the
                                     full corpus on host)
  prefetch_to_device(it, size)     — overlap host→device transfer with
                                     consumer compute
Cell semantics match the whole-file paths exactly (headerless, every
cell coerced to float, non-numeric/empty/NaN -> 0.0).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

from cvaegan_tpu.data._native_build import load_native

_SRC = pathlib.Path(__file__).resolve().parent.parent / "native" / "stream_reader.cpp"


def _configure(lib: ctypes.CDLL) -> None:
    lib.stream_open.restype = ctypes.c_int64
    lib.stream_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.stream_cols.restype = ctypes.c_int64
    lib.stream_cols.argtypes = [ctypes.c_int64]
    lib.stream_next.restype = ctypes.c_int
    lib.stream_next.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.stream_close.restype = None
    lib.stream_close.argtypes = [ctypes.c_int64]


def _get_lib() -> Optional[ctypes.CDLL]:
    return load_native(_SRC, _configure)


class StreamingCSV:
    """Iterate float32 [rows, cols] chunks of a headerless CSV.

    Native C++ background-prefetch reader when the toolchain is
    available; otherwise a pandas `chunksize` fallback with identical
    cell semantics. Usable as an iterator and as a context manager
    (closing releases the reader thread early).

    Thread ownership: a StreamingCSV and its iterators belong to ONE
    consumer thread. `close()` destroys the native stream objects; a
    concurrent `stream_next` call from another thread (ctypes releases
    the GIL) would then wait on a freed condvar — use-after-free. Only
    the native reader's internal prefetch thread is concurrent, and the
    stream destructor joins it.
    """

    def __init__(self, path, chunk_rows: int = 262_144):
        self.path = str(path)
        self.chunk_rows = int(chunk_rows)
        #: handles of this object's LIVE iterators (each `iter()` opens
        #: its own native stream; `close()` releases them all)
        self._handles: set = set()
        self._lib = _get_lib()

    # ------------------------------------------------------------ native
    def _iter_native(self) -> Iterator[np.ndarray]:
        lib = self._lib
        handle = lib.stream_open(self.path.encode(), self.chunk_rows)
        if handle == 0:
            if not os.path.exists(self.path):
                raise FileNotFoundError(self.path)
            raise ValueError(f"empty csv: {self.path}")
        self._handles.add(handle)
        cols = lib.stream_cols(handle)
        buf = np.empty((self.chunk_rows, cols), dtype=np.float32)
        rows = ctypes.c_int64(0)
        try:
            while True:
                rc = lib.stream_next(
                    handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    ctypes.byref(rows))
                if rc == 1:
                    break
                if rc != 0:
                    raise IOError(
                        f"I/O error mid-stream on {self.path} — corpus "
                        "would be truncated")
                yield buf[: rows.value].copy()
        finally:
            if handle in self._handles:
                self._handles.discard(handle)
                lib.stream_close(handle)

    # ----------------------------------------------------------- fallback
    def _iter_pandas(self) -> Iterator[np.ndarray]:
        import pandas as pd

        # Schema = first non-empty line, like the native reader; rows
        # longer than it are truncated (python engine + on_bad_lines
        # callable), shorter ones NaN-padded then zero-filled — keeping
        # both backends cell-identical.
        with open(self.path) as f:
            first = next((ln for ln in f if ln.strip()), None)
        if first is None:
            raise ValueError(f"empty csv: {self.path}")
        cols = first.count(",") + 1
        reader = pd.read_csv(
            self.path, header=None, names=range(cols),
            chunksize=self.chunk_rows, engine="python",
            on_bad_lines=lambda row: row[:cols])
        for frame in reader:
            frame = frame.apply(pd.to_numeric, errors="coerce").fillna(0)
            yield frame.to_numpy(dtype=np.float32)

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._lib is not None:
            return self._iter_native()
        return self._iter_pandas()

    def close(self) -> None:
        if self._lib is not None:
            while self._handles:
                self._lib.stream_close(self._handles.pop())

    def __enter__(self) -> "StreamingCSV":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def stream_minmax(path, chunk_rows: int = 262_144
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """One-pass per-column (min, max) — the statistics `renormalized()`
    needs, computed in O(chunk) memory."""
    lo = hi = None
    for chunk in StreamingCSV(path, chunk_rows):
        c_lo, c_hi = chunk.min(axis=0), chunk.max(axis=0)
        lo = c_lo if lo is None else np.minimum(lo, c_lo)
        hi = c_hi if hi is None else np.maximum(hi, c_hi)
    if lo is None:
        raise ValueError(f"empty csv: {path}")
    return lo, hi


def load_csv_streamed(path, chunk_rows: int = 262_144):
    """Device-resident float32 array built with chunked uploads.

    Peak HOST memory is O(chunk) — the corpus only ever exists in full
    in device HBM. (The final on-device concatenate transiently holds
    2x the corpus in HBM; chunks upload while the reader parses ahead.)
    """
    import jax.numpy as jnp

    parts = [jnp.asarray(chunk) for chunk in StreamingCSV(path, chunk_rows)]
    if not parts:
        raise ValueError(f"empty csv: {path}")
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def prefetch_to_device(iterable: Iterable[np.ndarray], size: int = 2):
    """Yield device arrays `size` transfers ahead of consumption.

    Classic double-buffering: while the consumer computes on chunk i,
    chunk i+1 is already in flight host→device.
    """
    import collections

    import jax

    queue: "collections.deque" = collections.deque()
    it = iter(iterable)
    try:
        for _ in range(size):
            queue.append(jax.device_put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(jax.device_put(next(it)))
        except StopIteration:
            pass
        yield out
