"""Tracing/profiling hooks (SURVEY.md §5 auxiliary subsystems).

``trace(dir)`` wraps any region in a ``jax.profiler`` trace producing a
TensorBoard-loadable XLA op/Pallas kernel timeline; ``phase_timer``
accumulates wall-clock per host-side pipeline phase for the bench reports.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace if a directory is given, no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class PhaseTimer:
    """Accumulates host wall-clock per named phase."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, dict]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "calls": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in self.totals
        }

    def dump(self) -> str:
        return json.dumps(self.report(), sort_keys=True)
