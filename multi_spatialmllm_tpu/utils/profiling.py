"""Profiling helpers: wall-clock stage timers + optional device traces.

Replaces the reference's ad-hoc TimeCounter decoration (SURVEY.md §5.1)
with nestable timers and a `jax.profiler` trace context for inspecting the
XLA programs the stages emit.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


class Timings:
    """Hierarchical named wall-clock timings."""

    def __init__(self):
        self.entries: list[tuple[str, float]] = []
        self._stack: list[str] = []

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        self._stack.append(name)
        label = "/".join(self._stack)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.entries.append((label, time.perf_counter() - t0))
            self._stack.pop()

    def as_dict(self) -> dict[str, float]:
        out: dict[str, float] = {}
        for label, dt in self.entries:
            out[label] = out.get(label, 0.0) + dt
        return out

    def report(self) -> str:
        return "\n".join(
            f"{label:48s} {dt:9.3f}s"
            for label, dt in sorted(self.as_dict().items()))


@contextlib.contextmanager
def device_trace(log_dir: str | None) -> Iterator[None]:
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
