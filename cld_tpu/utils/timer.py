"""Timers + profiling hooks.

Capability parity with the reference's ad-hoc tracing (SURVEY.md §5):
`Timers` tic/toc aggregation (`/root/reference/src/tbsim/utils/timer.py:1-64`,
used around the env loop) plus the TPU-native upgrade: a `jax.profiler`
trace context for xprof-compatible device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class Timer:
    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._start = None

    def tic(self):
        self._start = time.perf_counter()

    def toc(self) -> float:
        elapsed = time.perf_counter() - self._start
        self.total += elapsed
        self.count += 1
        return elapsed

    @property
    def average(self) -> float:
        return self.total / max(1, self.count)


class Timers:
    """Named tic/toc aggregation (`timer.py:44-64`)."""

    def __init__(self):
        self._timers: Dict[str, Timer] = defaultdict(Timer)

    def tic(self, name: str):
        self._timers[name].tic()

    def toc(self, name: str) -> float:
        return self._timers[name].toc()

    @contextlib.contextmanager
    def timed(self, name: str):
        self.tic(name)
        try:
            yield
        finally:
            self.toc(name)

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total": t.total, "count": t.count, "average": t.average}
            for k, t in self._timers.items()
        }

    def __str__(self) -> str:
        return " | ".join(
            f"{k}: {t.average * 1e3:.2f}ms x{t.count}" for k, t in self._timers.items()
        )


@contextlib.contextmanager
def device_trace(log_dir: str):
    """xprof-compatible device trace around a block (view with
    tensorboard/xprof). The TPU-native replacement for the reference's
    wall-clock phase prints (`scene_edit_utils.py:96-117`)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
