"""Tracing / profiling harness (SURVEY.md §5.1).

The reference has no profiling at all; here: wall-clock timing with
``block_until_ready`` (the only honest way to time async XLA dispatch),
throughput accounting in the driver's units (rays/s, Mpaths/s
[BASELINE.json:2]), and optional ``jax.profiler`` trace capture for
perfetto/tensorboard inspection of the compiled wavefront loop.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax

__all__ = ["Timer", "time_fn", "throughput", "trace_to"]


@dataclass
class Timer:
    """Accumulating named wall-clock timer."""

    times: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0)


def time_fn(fn: Callable, *args, warmup: int = 1, repeats: int = 3,
            **kwargs) -> float:
    """Best-of-N seconds for ``fn(*args)`` with device sync each run."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return best


def throughput(num_paths: int, num_segments: int, seconds: float) -> dict:
    """The driver's metrics [BASELINE.json:2]."""
    return {
        "seconds": seconds,
        "mpaths_per_s": num_paths / seconds / 1e6,
        "mrays_per_s": num_segments / seconds / 1e6,
        "avg_path_length": num_segments / max(num_paths, 1),
    }


@contextlib.contextmanager
def trace_to(logdir: Optional[str]):
    """``jax.profiler`` trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield
