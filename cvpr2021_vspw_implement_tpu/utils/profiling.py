"""Profiling/tracing helpers (the reference has none systematic — SURVEY §5;
its only timing is per-iter AverageMeter prints, train.py:94-108, and a
manual CUDA microbench in spatial_ocr_block.py:502-517).

TPU-native observability:
  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable device trace;
  * ``annotate(name)`` — named trace region (shows up on the TPU timeline);
  * ``step_timer`` — host-side per-step wall/data-time accounting that
    forces a device sync via a scalar readback (block_until_ready is
    unreliable through the axon tunnel).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates per-step wall time with a forced device sync."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_array=None) -> float:
        if sync_array is not None:
            float(jax.numpy.sum(sync_array.ravel()[:1]))  # force readback
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
