"""Profiling / tracing utilities.

The reference has no built-in profiler (SURVEY.md §5 — ad-hoc wall clocks and
unused ptflops/nvitop requirements).  We provide first-class hooks:
  - ``trace(log_dir)``: jax.profiler trace context (view in TensorBoard /
    xprof) around any region — training steps, a full sampling run.
  - ``annotate(name)``: named TraceAnnotation for device timeline rows.
  - ``PhaseTimer``: lightweight host-side phase timing with summary().
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"{name}: {self.totals[name]:.3f}s "
                         f"({self.counts[name]}x, "
                         f"{self.totals[name] / max(self.counts[name], 1) * 1e3:.1f}ms avg)")
        return "\n".join(lines)
