"""Named-section wall-clock profiler.

Equivalent of the reference's `Core/src/Utils/Stopwatch.h` TICK/TOCK singleton
(which streams timings over UDP to StopwatchViewer and dumps CSV via
`ElasticFusion::saveTimes`, `ElasticFusion.cpp:898-931`).  Here: a plain object
with context-manager sections and CSV export; JAX async dispatch means callers
must block (`jax.block_until_ready`) before timing if they want device time —
`section(..., block=...)` takes the arrays to block on.
"""

from __future__ import annotations

import contextlib
import csv
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax


class Stopwatch:
    def __init__(self) -> None:
        self.timings: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str, block=None):
        """Time a named section in milliseconds.  If `block` is given (a
        pytree of arrays), block on it before stopping the clock so device
        work is included."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                jax.block_until_ready(block)
            self.timings[name].append((time.perf_counter() - t0) * 1e3)

    def tick(self, name: str) -> float:
        return time.perf_counter()

    def tock(self, name: str, t0: float, block=None) -> None:
        if block is not None:
            jax.block_until_ready(block)
        self.timings[name].append((time.perf_counter() - t0) * 1e3)

    def mean(self, name: str) -> float:
        vals = self.timings.get(name, [])
        return sum(vals) / len(vals) if vals else 0.0

    def last(self, name: str) -> float:
        vals = self.timings.get(name, [])
        return vals[-1] if vals else 0.0

    def write_csv(self, path: str, names: Optional[List[str]] = None) -> None:
        """CSV layout mirrors the reference's `.timings.csv`
        (`ElasticFusion.cpp:898-931`): one column per section, one row per
        recorded sample (ragged columns padded with empty cells)."""
        names = names or sorted(self.timings)
        rows = max((len(self.timings[n]) for n in names), default=0)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(names)
            for i in range(rows):
                w.writerow(
                    [
                        f"{self.timings[n][i]:.4f}" if i < len(self.timings[n]) else ""
                        for n in names
                    ]
                )

    def summary(self) -> Dict[str, float]:
        return {n: self.mean(n) for n in self.timings}
