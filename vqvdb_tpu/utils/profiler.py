"""Profiling utilities: stage timers + JAX device tracing.

The reference shipped a singleton timer (PerformanceProfiler, ref:
src/Utils/Profiler.hpp:20-72) that was never invoked, plus ad-hoc printf
wall-clock timing (ref: src/orchestrator/VQVAECodec.cpp:131-133). Here the
equivalent is actually wired in: the codec/bench use `Profiler` for
per-stage host timing, and `trace()` wraps jax.profiler for device-level
Perfetto traces on TPU.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class Profiler:
    """Accumulating named stage timer (host wall clock)."""

    def __init__(self) -> None:
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self._total[name],
                "count": self._count[name],
                "mean_ms": 1e3 * self._total[name] / max(self._count[name], 1),
            }
            for name in sorted(self._total)
        }

    def print_report(self) -> None:
        for name, row in self.report().items():
            print(f"[profile] {name:<24} total={row['total_s']:.3f}s "
                  f"n={row['count']} mean={row['mean_ms']:.2f}ms")

    def reset(self) -> None:
        self._total.clear()
        self._count.clear()


@contextlib.contextmanager
def scoped_timer(name: str, log_fn=print) -> Iterator[None]:
    """RAII-style one-shot timer (ref ScopedTimer, Profiler.hpp:60-68)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        log_fn(f"[timer] {name}: {(time.perf_counter() - t0) * 1e3:.2f} ms")


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Device-level trace via jax.profiler (viewable in Perfetto/XProf).

    No-op when log_dir is None, so call sites can leave it wired in.
    """
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
