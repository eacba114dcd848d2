"""Profiling/tracing subsystem.

The reference had only a dead `--profile` flag
(/root/reference/evaluation/runner.py:106-110) and a `\\r` progress line;
here tracing is a real subsystem (SURVEY.md section 5): jax.profiler
traces around any region, plus a lightweight step timer whose summaries
land in the metrics stream.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-rate meter; logs scalars through a MetricsWriter."""

    def __init__(self, writer=None, prefix: str = "perf"):
        self.writer = writer
        self.prefix = prefix
        self._t0: Optional[float] = None
        self._count = 0
        self._totals: Dict[str, float] = {}

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, step: int, items: int = 1, tag: str = "step") -> float:
        dt = time.perf_counter() - self._t0
        self._count += 1
        self._totals[tag] = self._totals.get(tag, 0.0) + dt
        if self.writer is not None:
            self.writer.add_scalar(f"{self.prefix}/{tag}_sec", dt, step)
            if items > 1:
                self.writer.add_scalar(
                    f"{self.prefix}/{tag}_items_per_sec", items / dt, step
                )
        return dt

    @contextlib.contextmanager
    def section(self, step: int, tag: str, items: int = 1):
        self.start()
        yield
        self.stop(step, items, tag)

    def summary(self) -> Dict[str, float]:
        return dict(self._totals)
