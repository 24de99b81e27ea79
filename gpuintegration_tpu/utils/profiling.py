"""Profiling hooks.

TPU analogue of the reference's tracing apparatus (SURVEY.md section 5.1:
std::chrono per-stage timers Workspace.cuh:159-352, cudaEvent pairs
cudaTimerUtil.h, NVTX ranges in demos): jax.profiler traces plus simple
wall-clock stage timers that block on device completion.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto) --
    replaces nvprof/NVTX workflows."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Blocking wall-clock stage timer (cudaEvent-pair analogue).

    Each stage() context blocks on the given arrays at exit so the time
    covers actual device execution, not async dispatch."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, *block_on):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on:
                jax.block_until_ready(block_on)
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self, outfile=None):
        rows = sorted(self.times.items(), key=lambda kv: -kv[1])
        for name, t in rows:
            line = f"{name},{t * 1e3:.3f}"
            if outfile is not None:
                print(line, file=outfile)
        return dict(rows)


def annotate(name: str):
    """Named trace span (NVTX range analogue)."""
    return jax.profiler.TraceAnnotation(name)
