"""Tracing / profiling / numerics-sanitizer utilities.

The reference's only instrumentation is wall-clock prints and `\\r`
progress bars (SURVEY.md §5). TPU-native upgrades:

  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard-loadable device trace of the fused train steps,
  * `Throughput` — steps/sec/chip + samples/sec counter (the BASELINE
    metrics) with a one-line JSON report,
  * `nan_debug()` — the numerics sanitizer: enables `jax_debug_nans` so
    any NaN produced inside a jitted step raises at the exact primitive
    (the reference has no equivalent).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/cvaegan_tpu_trace"):
    """Capture a device profile for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_debug():
    """Raise on the first NaN produced inside jitted code."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class Throughput:
    """Steps/sec (and optional samples/sec) counter.

    >>> t = Throughput(steps_per_epoch=65, batch_size=128)
    >>> t.start(); ...train...; print(t.report(epochs=100))
    """

    def __init__(self, steps_per_epoch: int, batch_size: Optional[int] = None):
        self.steps_per_epoch = steps_per_epoch
        self.batch_size = batch_size
        self._t0: Optional[float] = None
        self.elapsed: float = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed

    def report(self, epochs: int) -> dict:
        if self._t0 is not None and self.elapsed == 0.0:
            self.stop()
        steps = epochs * self.steps_per_epoch
        out = {
            "steps": steps,
            "seconds": round(self.elapsed, 3),
            "steps_per_sec": round(steps / self.elapsed, 2),
        }
        if self.batch_size:
            out["samples_per_sec"] = round(
                steps * self.batch_size / self.elapsed, 1)
        return out

    def report_json(self, epochs: int) -> str:
        return json.dumps(self.report(epochs))
