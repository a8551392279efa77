"""Tracing / profiling helpers.

The reference has only ad-hoc wall-clock prints in __main__ blocks
(SURVEY.md §5: model.py:314-318 etc.).  Here: a `jax.profiler` trace context
for device timelines (view in TensorBoard / Perfetto), and a lightweight
stage timer for host-side pipeline accounting.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile (XLA ops, DMA, scheduling) to ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock timer for named pipeline stages.

    Blocks on device results (``block=True``) so stages containing async
    dispatches measure real completion time.
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None, block: bool = True):
        t0 = time.perf_counter()
        holder = {}

        def keep(x):
            holder["out"] = x
            return x

        try:
            yield keep
        finally:
            if block and "out" in holder:
                jax.block_until_ready(holder["out"])
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(
                f"{name:32s} total {tot * 1e3:9.2f} ms  "
                f"calls {n:5d}  mean {tot / n * 1e3:8.3f} ms")
        return "\n".join(lines)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "calls": self.counts[k],
                "mean_ms": self.totals[k] / self.counts[k] * 1e3}
            for k in self.totals
        }
