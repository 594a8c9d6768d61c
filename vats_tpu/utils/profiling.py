"""Profiling / tracing hooks.

The reference has no tracing or profiling at all (SURVEY.md §5 — only ad-hoc
``time.time()`` in one test).  TPU-native observability:

  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace (XLA ops, fusion view, HBM usage)
  * :class:`StepTimer` — wall-clock per-step timing with tokens/sec and
    devices-aware summaries, safe under async dispatch (forces a sync on
    read)
  * :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so train-loop
    phases show up in the trace timeline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "profiles", *, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace around the enclosed block."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that appears in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step timing; call ``tick(result, tokens=...)`` once per step."""

    def __init__(self, window: int = 50):
        self.window = window
        self._durations = []
        self._tokens = []
        self._last = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def tick(self, result: Any = None, tokens: int = 0) -> float:
        """Returns the step duration.  ``result`` (any jax pytree) is synced
        so async dispatch doesn't fake instant steps."""
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = now - (self._last if self._last is not None else now)
        self._last = now
        self._durations.append(dt)
        self._tokens.append(tokens)
        if len(self._durations) > self.window:
            self._durations.pop(0)
            self._tokens.pop(0)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self._durations:
            return {}
        total = sum(self._durations)
        return {
            "mean_step_s": total / len(self._durations),
            "steps_per_s": len(self._durations) / total if total else 0.0,
            "tokens_per_s": sum(self._tokens) / total if total else 0.0,
        }
