"""Diagnostics + profiling surface.

Parity with the reference's observability (SURVEY.md §5): Tracy zones +
per-subsystem getDiagnostics() strings feeding the client diagnostics panel
(PhysicsWorld.cpp:1578-1604 etc.).  Here: a registry that aggregates every
subsystem's get_diagnostics(), simple scoped timers (Tracy-zone stand-in),
and a helper that runs a function under the JAX profiler.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class ScopedTimerStats:
    """Per-zone wall-time accumulation (ZoneScopedN equivalent)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def zone(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"  {name}: {tot*1e3:.2f} ms total, "
                         f"{tot/max(n,1)*1e3:.3f} ms avg x{n}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


class DiagnosticsRegistry:
    """Aggregates get_diagnostics() across subsystems (the client
    diagnostics panel surface)."""

    def __init__(self):
        self._providers: list = []
        self.timers = ScopedTimerStats()

    def register(self, provider):
        """provider: object with get_diagnostics() -> str."""
        self._providers.append(provider)

    def get_diagnostics(self) -> str:
        parts = []
        for p in self._providers:
            try:
                parts.append(p.get_diagnostics())
            except Exception as e:
                parts.append(f"{type(p).__name__}: diagnostics error: {e}")
        timer_report = self.timers.report()
        if timer_report:
            parts.append("Timers:\n" + timer_report)
        return "\n".join(parts)


def profile_jax(fn, *args, trace_dir: str = "/tmp/substrata_trace", iters: int = 5):
    """Run fn under the JAX profiler (Tracy-capture equivalent); returns the
    trace directory for inspection."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return trace_dir
