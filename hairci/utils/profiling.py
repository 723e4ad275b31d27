"""Profiling helpers — the tracing subsystem the reference lacks
(SURVEY.md §5: "Tracing / profiling: none"; the TPU build gets
`jax.profiler` traces and per-step timing as a cheap superset).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hairci_trace") -> Iterator[None]:
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock per-step timing with warmup discard."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times = []
        self._t0: Optional[float] = None
        self._step = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._step += 1
        if self._step > self.warmup:
            self._times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    @property
    def p50(self) -> float:
        if not self._times:
            return 0.0
        s = sorted(self._times)
        return s[len(s) // 2]
