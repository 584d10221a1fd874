"""Tracing and phase timing.

TPU equivalents of the reference's profiling hooks (SURVEY.md §5):
``record_function`` scopes around G/D substeps become
`jax.profiler` ``named_scope``/``TraceAnnotation``; the trainer's wall-clock
phase ``Timer`` map (`utils/commons/meters.py:21`) is kept as-is.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

# XLA-visible scope: shows up in xprof/tensorboard traces
named_scope = jax.named_scope


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a device trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Named wall-clock accumulator (`meters.py:21`).

    with Timer("forward", enable=True): ...
    Timer.report() -> {name: seconds}
    """

    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)

    def __init__(self, name: str, enable: bool = True):
        self.name = name
        self.enable = enable

    def __enter__(self):
        if self.enable:
            self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        if self.enable:
            dt = time.time() - self.t0
            Timer.totals[self.name] += dt
            Timer.counts[self.name] += 1

    @classmethod
    def report(cls) -> dict[str, float]:
        return dict(cls.totals)

    @classmethod
    def reset(cls):
        cls.totals.clear()
        cls.counts.clear()
