"""Tracing / per-phase timing (SURVEY §5 tracing row).

The reference's observability is wall-clock prints + RSS
(src/useful_macros.h:64-79, src/file_io.c:195-206).  Here:

  * :func:`trace` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable device trace (set ``BFT_TRACE_DIR`` or pass a dir).
  * :class:`PhaseTimer` — named phase accumulator used by the drivers
    (parse / insert / flush / compress / query), printed like the
    reference's per-file telemetry.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(trace_dir: str | None = None):
    """Capture a jax.profiler device trace if a directory is configured."""
    import jax
    trace_dir = trace_dir or os.environ.get("BFT_TRACE_DIR")
    if not trace_dir:
        yield None
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield trace_dir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulate wall time per named phase; print a reference-style recap."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [f"  {name}: {tot:.3f} s ({self.counts[name]}x)"
                 for name, tot in sorted(self.totals.items(),
                                         key=lambda kv: -kv[1])]
        return "Phase timing:\n" + "\n".join(lines) if lines else ""
