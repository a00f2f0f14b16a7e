"""Profiling hooks: per-transform wall timing + JAX profiler traces.

The reference ships no observability (SURVEY.md §5.1 calls this out as a
gap to fill, not to clone). Usage::

    with torchio_tpu.profiling.profile() as prof:
        augmented = pipeline(subject)
    print(prof.report())

    torchio_tpu.profiling.start_trace("/tmp/jax-trace")  # tensorboard
    ...
    torchio_tpu.profiling.stop_trace()
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any

import jax

from .transforms.transform import Transform

_active: list["_Profile"] = []


class _Profile:
    def __init__(self) -> None:
        self.records: dict[str, list[float]] = defaultdict(list)

    def add(self, name: str, seconds: float) -> None:
        self.records[name].append(seconds)

    def report(self) -> str:
        lines = ["transform            calls   total(s)   mean(ms)"]
        for name, times in sorted(
            self.records.items(), key=lambda kv: -sum(kv[1])
        ):
            total = sum(times)
            lines.append(
                f"{name:<20} {len(times):>5}   {total:>8.3f}   "
                f"{1000 * total / len(times):>8.1f}"
            )
        return "\n".join(lines)

    def total(self, name: str) -> float:
        return sum(self.records.get(name, []))


@contextlib.contextmanager
def profile():
    """Record synchronized wall time of every transform application."""
    prof = _Profile()
    original = Transform.forward

    def timed_forward(self: Transform, data: Any) -> Any:
        t0 = time.perf_counter()
        result = original(self, data)
        # synchronize so timings reflect real device work
        try:
            leaves = []
            if hasattr(result, "images"):
                leaves = [ib.data for ib in result.images.values()]
            elif hasattr(result, "data"):
                leaves = [result.data]
            jax.block_until_ready(leaves)
        except Exception:
            pass
        prof.add(type(self).__name__, time.perf_counter() - t0)
        return result

    Transform.forward = timed_forward  # type: ignore[method-assign]
    _active.append(prof)
    try:
        yield prof
    finally:
        _active.remove(prof)
        Transform.forward = original  # type: ignore[method-assign]


def start_trace(log_dir: str) -> None:
    """Start a JAX profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


@contextlib.contextmanager
def trace(log_dir: str):
    """Context-managed JAX profiler trace."""
    start_trace(log_dir)
    try:
        yield
    finally:
        stop_trace()
