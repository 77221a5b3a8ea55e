"""Profiling helpers: step timing breakdown + jax.profiler traces.

The reference hand-rolls per-batch data/fwd/loss/bwd wall-clock averages
(`train_multi_peaks_vonMises_KL.py:206-252`); under jit those phases fuse,
so the first-class breakdown here is data (host gather + H2D + augment) vs
step (fwd+loss+bwd+update), plus ``jax.profiler`` trace capture for real
kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class StepTimer:
    """Accumulate named wall-clock segments; read averages at epoch end."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def track(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def averages(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace_annotation(name: str):
    """Annotate a region in the jax profiler timeline."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
