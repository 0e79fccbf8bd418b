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
import socket
import struct
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax


class Stopwatch:
    def __init__(self) -> None:
        self.timings: Dict[str, List[float]] = defaultdict(list)
        self._udp: Optional[socket.socket] = None
        self._udp_addr = ("127.0.0.1", 45454)
        self._udp_interval = 10.0
        self._udp_last = 0.0

    # --- StopwatchViewer-style UDP streaming --------------------------------
    def enable_udp(
        self, host: str = "127.0.0.1", port: int = 45454, interval_s: float = 10.0
    ) -> None:
        """Stream latest timings over UDP, the reference `Stopwatch::sendAll`
        protocol (`Utils/Stopwatch.h:144-158`: every 10 s to 127.0.0.1:45454
        for the external StopwatchViewer): payload = total byte count (i32)
        followed by [name\\0 + f32 latest-ms] records."""
        self._udp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._udp_addr = (host, port)
        self._udp_interval = interval_s
        self._udp_last = 0.0

    def _maybe_send(self) -> None:
        if self._udp is None:
            return
        now = time.monotonic()
        if now - self._udp_last < self._udp_interval:
            return
        self._udp_last = now
        body = b""
        for name, vals in self.timings.items():
            if vals:
                body += name.encode() + b"\x00" + struct.pack("<f", vals[-1])
        packet = struct.pack("<i", len(body) + 4) + body
        try:
            self._udp.sendto(packet, self._udp_addr)
        except OSError:
            pass

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
        self._maybe_send()

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
