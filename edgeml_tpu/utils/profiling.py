"""Timing spans and profiler hooks.

The reference persists wall-time spans alongside results (reward.py:76-92,
regression.py:65-70) and has no profiler integration (SURVEY.md section 5.1).
Here the same span timing is a context manager, and `trace()` optionally
captures a jax.profiler trace (viewable in TensorBoard/Perfetto) around any
region — the TPU-native upgrade path.
"""

from __future__ import annotations

import contextlib
import time


class Span:
    """Accumulating wall-time span: `with span: ...`; `.total` in seconds."""

    def __init__(self, name: str = ""):
        self.name = name
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1
        return False

    @property
    def mean(self):
        return self.total / max(self.count, 1)

    def __repr__(self):
        return f"Span({self.name}: total={self.total:.4f}s n={self.count})"


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """jax.profiler trace around a region when log_dir is given, no-op
    otherwise. Usage: `with trace('/tmp/jax-trace'): step(...)`."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
