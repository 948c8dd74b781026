"""Tracing / profiling helpers.

The reference has no profiling beyond debug logs (SURVEY.md section 5;
ctx.log_debug sprinkled through src/lib.rs). Here the hot paths are jitted
device programs, so the two useful tools are (a) wall-clock phase timing
with device sync, and (b) the JAX profiler for op-level traces viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase, syncing the device."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            # one sync so async dispatch doesn't misattribute time
            (jax.device_put(0) + 0).block_until_ready()
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_s": round(total, 4),
                "calls": self.counts[name],
                "mean_ms": round(total / self.counts[name] * 1e3, 3),
            }
            for name, total in sorted(
                self.totals.items(), key=lambda kv: -kv[1]
            )
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """JAX profiler trace around a block: view with TensorBoard or
    Perfetto (``jax.profiler.trace`` writes to ``log_dir``)."""
    with jax.profiler.trace(log_dir):
        yield
