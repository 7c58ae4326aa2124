"""Profiling & step-timing — the observability layer the reference lacks.

The reference's only instrumentation is a coarse validation wall-clock
(train.py:86-115) and tqdm bars; its tb_logger wiring is dead (SURVEY.md §5).
Here:

  * `trace(logdir)` — context manager around jax.profiler.trace; produces
    XLA/TPU traces viewable in TensorBoard or Perfetto.
  * `annotate(name)` — jax.profiler.TraceAnnotation wrapper for custom spans.
  * `StepTimer` — cheap rolling wall-clock stats (mean/p50/p95 step time,
    steps/sec) with correct async-dispatch semantics: call `.tick()` AFTER a
    blocking result fetch (or pass `block=` the device array to wait on),
    otherwise you time dispatch, not compute.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax/XLA profiler trace into `logdir`."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step wall-clock statistics."""

    def __init__(self, window: int = 200):
        self.window = window
        self.times = deque(maxlen=window)
        self._last = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def tick(self, block=None) -> float:
        """Record one step; optionally block on a device value first."""
        if block is not None:
            jax.block_until_ready(block)
        now = time.perf_counter()
        dt = 0.0 if self._last is None else now - self._last
        if self._last is not None:
            self.times.append(dt)
        self._last = now
        return dt

    @property
    def steps_per_sec(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    def summary(self) -> dict:
        if not self.times:
            return {"steps_per_sec": 0.0, "mean_s": 0.0, "p50_s": 0.0, "p95_s": 0.0}
        xs = sorted(self.times)
        n = len(xs)
        return {
            "steps_per_sec": self.steps_per_sec,
            "mean_s": sum(xs) / n,
            "p50_s": xs[n // 2],
            "p95_s": xs[min(n - 1, int(0.95 * n))],
        }

    def summary_str(self) -> str:
        s = self.summary()
        return (
            f"{s['steps_per_sec']:.2f} steps/s (mean {s['mean_s'] * 1e3:.1f} ms, "
            f"p50 {s['p50_s'] * 1e3:.1f} ms, p95 {s['p95_s'] * 1e3:.1f} ms)"
        )
