"""Tracing and per-stage timing.

The reference has no profiling at all (SURVEY.md §5); its only observability
is per-window log files.  This module provides the two channels a production
scan needs:

- :class:`StageTimers` — wall-clock accumulation per pipeline stage
  (extract / build / h2d / device / emit), with the windows/sec/chip
  north-star counter (BASELINE.json).
- :func:`device_trace` — a jax.profiler trace context writing a TensorBoard
  trace directory for kernel-level inspection.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

__all__ = ["StageTimers", "device_trace"]


class StageTimers:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self.samples: Dict[str, list] = {}
        self.windows = 0
        self._start = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            self.samples.setdefault(name, []).append(dt)

    def add_windows(self, n: int) -> None:
        self.windows += n

    def elapsed(self) -> float:
        return time.perf_counter() - self._start

    def to_json(self) -> dict:
        """Machine-readable stage breakdown (per-call samples included so a
        consumer can exclude the first device call's jit compile)."""
        return {
            "windows": self.windows,
            "elapsed_sec": self.elapsed(),
            "stages": {
                name: {
                    "total_sec": self.totals[name],
                    "calls": self.counts[name],
                    "samples_sec": self.samples[name],
                }
                for name in self.totals
            },
        }

    def report(self) -> str:
        elapsed = time.perf_counter() - self._start
        lines = [f"elapsed {elapsed:.2f}s, windows {self.windows}"
                 + (f" ({self.windows / elapsed:.1f}/s)" if elapsed > 0 else "")]
        for name in sorted(self.totals, key=lambda k: -self.totals[k]):
            total = self.totals[name]
            count = self.counts[name]
            lines.append(
                f"  {name:10s} {total:8.2f}s total  {count:5d} calls  "
                f"{total / max(count, 1) * 1e3:8.1f} ms/call"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when a directory is given; no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
