"""Tracing / profiling hooks.

The reference's observability is per-stage wall-clock prints
(reference: src/gpd/grasp_detector.cpp:313-320, hand_search.cpp:60-61);
GraspDetector.detect keeps that report. This module adds the TPU-native
layer on top: `jax.profiler` device traces (viewable in TensorBoard /
Perfetto) gated by the ``GPD_TPU_PROFILE`` environment variable, and named
sub-spans via ``TraceAnnotation`` for the host-side stages.

Usage:
    GPD_TPU_PROFILE=/tmp/gpd_trace python -m gpd_tpu.apps.detect_grasps ...
or programmatically:
    with profiling.maybe_trace():           # no-op unless env var is set
        detector.detect(cloud)
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


def profile_dir() -> Optional[str]:
    d = os.environ.get("GPD_TPU_PROFILE", "")
    return d or None


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str] = None) -> Iterator[None]:
    """Wrap a block in a jax.profiler trace if GPD_TPU_PROFILE (or an
    explicit trace_dir) is set; otherwise a zero-cost no-op."""
    d = trace_dir or profile_dir()
    if not d:
        yield
        return
    import jax
    with jax.profiler.trace(d):
        yield
    print(f"# jax profiler trace written to {d}")


@contextlib.contextmanager
def span(name: str) -> Iterator[None]:
    """Named sub-span: shows up inside device traces (StepTraceAnnotation)
    and costs nothing when tracing is off."""
    if not profile_dir():
        yield
        return
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Per-stage wall-clock accumulator matching the reference's RUNTIMES
    report (grasp_detector.cpp:313-320). Works on remote-TPU backends where
    block_until_ready can return early: callers pass a `sync` fetch."""

    def __init__(self):
        self.stages = {}
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t = time.perf_counter()
        with span(name):
            yield
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t

    def total(self) -> float:
        return time.perf_counter() - self._t0

    def report(self) -> str:
        lines = ["======== RUNTIMES ========"]
        for i, (name, dt) in enumerate(self.stages.items(), 1):
            lines.append(f" {i}. {name}: {dt:.4f}s")
        lines.append("==========")
        lines.append(f" TOTAL: {self.total():.4f}s")
        return "\n".join(lines)
