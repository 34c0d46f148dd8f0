"""Timing / profiling utilities.

Counterpart of the reference's Timer namespace (include/timer.h:13-199,
cudaEvent accumulating map) and ChronoTimer (include/util.cuh:45-120,
median/mean/stddev stats).  On JAX, sections bracket device work with
block_until_ready; for kernel-level traces use `jax.profiler` around the
same sections (tracing hooks below).
"""

from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict

import jax

_ACC: dict[str, float] = defaultdict(float)
_COUNT: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def section(name: str, sync: bool = True):
    """Accumulating named timer (Timer::start/stopGPUTimer)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            # drain async dispatch so the section owns its device time
            jax.effects_barrier()
        _ACC[name] += time.perf_counter() - t0
        _COUNT[name] += 1


def accumulated() -> dict[str, float]:
    return dict(_ACC)


def add_accumulated(name: str, seconds: float):
    """Merge externally-recorded time (checkpoint/resume restores the
    buckets of earlier chunks of a multi-process run)."""
    _ACC[name] += seconds


def print_accumulated(out=print):
    """Timer::printAccumulatedTimes — sorted dump."""
    width = max((len(k) for k in _ACC), default=4)
    for name, total in sorted(_ACC.items(), key=lambda kv: -kv[1]):
        out(f"  {name:<{width}}  {total * 1e3:10.2f} ms  "
            f"(x{_COUNT[name]})")


def clear():
    _ACC.clear()
    _COUNT.clear()


class ChronoTimer:
    """Median/mean/stddev stats over repeated timed runs
    (reference ChronoTimer, include/util.cuh:45-120)."""

    def __init__(self, name: str):
        self.name = name
        self.samples_ms: list[float] = []

    @contextlib.contextmanager
    def run(self):
        t0 = time.perf_counter()
        yield
        jax.effects_barrier()
        self.samples_ms.append((time.perf_counter() - t0) * 1e3)

    def bench(self, fn, iters: int = 10, warmup: int = 2):
        """Time `fn()` (blocking on its result) `iters` times."""
        for _ in range(warmup):
            jax.block_until_ready(fn())
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            self.samples_ms.append((time.perf_counter() - t0) * 1e3)
        return self

    @property
    def median_ms(self) -> float:
        return statistics.median(self.samples_ms)

    @property
    def mean_ms(self) -> float:
        return statistics.fmean(self.samples_ms)

    @property
    def stdev_ms(self) -> float:
        return statistics.pstdev(self.samples_ms)

    def row(self) -> str:
        return (f"{self.name},{self.median_ms:.3f},{self.mean_ms:.3f},"
                f"{self.stdev_ms:.3f},{len(self.samples_ms)}")

    @staticmethod
    def header() -> str:
        return "name,median_ms,mean_ms,stdev_ms,samples"
