"""Profiling hooks: wall-clock stage timers + jax.profiler traces.

The reference ships an unused `Timer` (`/root/reference/include/
timer.h:11-34`, included by viso.cpp:3 but never called — SURVEY.md §5);
here timing is first-class because frames/s and BA-iters/s are the
project's north-star metrics.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulating per-stage wall-clock timer.

    Use `block=True` (default) to `block_until_ready` a result inside the
    context so async dispatch doesn't hide device time.
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        yield
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def timed(self, name: str, fn, *args, block: bool = True, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        if block:
            out = jax.block_until_ready(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def report(self):
        rows = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            total = self.totals[name]
            n = self.counts[name]
            rows.append(
                f"{name:32s} {total * 1e3:9.1f} ms total  "
                f"{total / n * 1e3:8.2f} ms/call  x{n}"
            )
        return "\n".join(rows)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
