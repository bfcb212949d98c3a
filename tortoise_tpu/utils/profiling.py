"""First-class tracing/profiling (the reference has none — SURVEY §5).

Per-stage wall timing plus optional ``jax.profiler`` trace capture for
xprof/tensorboard analysis.
"""
from __future__ import annotations

import contextlib
import json
import time


class StageTimer:
    """Collects named stage timings; ``report()`` returns/prints a summary."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stages: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages.append((name, time.perf_counter() - t0))

    def report(self, print_it: bool = False) -> dict[str, float]:
        summary: dict[str, float] = {}
        for name, dt in self.stages:
            summary[name] = summary.get(name, 0.0) + dt
        if print_it:
            total = sum(summary.values())
            for name, dt in sorted(summary.items(), key=lambda kv: -kv[1]):
                print(f"  {name:>28s}: {dt * 1000:8.1f} ms ({dt / total * 100:4.1f}%)")
        return summary

    def json(self) -> str:
        return json.dumps(self.report())


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tortoise_tpu_trace"):
    """Capture a jax.profiler trace around a code block (view with xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
