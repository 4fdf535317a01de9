"""Profiling/tracing helpers (SURVEY.md §5 tracing row).

Wraps ``jax.profiler`` so runs can capture Perfetto/TensorBoard traces, and
provides named scopes around the hot phases (lookup / interaction / tower)
plus a steady-state throughput meter used by bench.py and the CLI.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(dir_path: str | None):
    """Capture a profiler trace into ``dir_path`` (no-op when None)."""
    if not dir_path:
        yield
        return
    jax.profiler.start_trace(dir_path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def scope(name: str):
    """Named scope visible in profiles: ``with scope("lookup"): ...``"""
    return jax.named_scope(name)


class ThroughputMeter:
    """Steady-state examples/s with a warmup cutoff."""

    def __init__(self, warmup_steps: int = 5):
        self.warmup_steps = warmup_steps
        self._steps = 0
        self._examples = 0
        self._t0: float | None = None

    def step(self, batch_size: int) -> None:
        self._steps += 1
        if self._steps == self.warmup_steps:
            self._t0 = time.perf_counter()
        elif self._steps > self.warmup_steps:
            self._examples += batch_size

    @property
    def examples_per_s(self) -> float:
        if self._t0 is None or self._examples == 0:
            return float("nan")
        return self._examples / (time.perf_counter() - self._t0)
