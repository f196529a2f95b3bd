"""Timers and hierarchical time logging.

Equivalents of the reference's Timer/TimeLogger
(/root/reference/src/Timer.hpp, TimeLogger.hpp): wall-clock scope timing with
named hierarchical scopes dumped as an indented report, plus a peak-RSS
memory snapshot helper (MemoryLogger equivalent).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import List, Optional


class Timer:
    def __init__(self, start: bool = True):
        self._total = 0.0
        self._since: Optional[float] = None
        if start:
            self.start()

    def start(self) -> None:
        self._since = time.perf_counter()

    def stop(self) -> float:
        if self._since is not None:
            self._total += time.perf_counter() - self._since
            self._since = None
        return self._total

    def value(self) -> float:
        running = (
            time.perf_counter() - self._since if self._since is not None else 0.0
        )
        return self._total + running


class TimeLogger:
    """Named hierarchical timing scopes → indented text report."""

    def __init__(self):
        self._records: List[tuple] = []  # (depth, name, seconds)
        self._stack: List[tuple] = []

    @contextmanager
    def scope(self, name: str):
        start = time.perf_counter()
        self._stack.append((name, start))
        index = len(self._records)
        self._records.insert(index, None)
        depth = len(self._stack) - 1
        try:
            yield
        finally:
            self._stack.pop()
            self._records[index] = (depth, name, time.perf_counter() - start)

    def report(self) -> str:
        lines = []
        for record in self._records:
            if record is None:
                continue
            depth, name, seconds = record
            lines.append(f"{'  ' * depth}{name}: {seconds:.3f} s")
        return "\n".join(lines)

    def write(self, filename: str) -> None:
        with open(filename, "w") as handle:
            handle.write(self.report() + "\n")


def peak_memory_bytes() -> int:
    """Peak RSS of this process (MemoryLogger / peak-RSS-at-exit equivalent,
    cf. /root/reference/src/CMacIonize.cpp:328-336)."""
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
