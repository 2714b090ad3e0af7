"""Tracing / profiling utilities.

The reference has none (SURVEY.md section 5: only checkpoint timestamps and
JSONL _stamp fields). Here: a step timer with percentile summaries and a
thin wrapper over jax.profiler for on-device traces viewable in
TensorBoard/Perfetto."""

import contextlib
import time

import numpy as np


class StepTimer:
    """Wall-clock step timing with p50/p90/p99 summaries."""

    def __init__(self, name="step"):
        self.name = name
        self.samples = []

    @contextlib.contextmanager
    def time(self):
        t0 = time.perf_counter()
        yield
        self.samples.append(time.perf_counter() - t0)

    def summary(self):
        if not self.samples:
            return {}
        arr = np.asarray(self.samples) * 1000.0
        return {
            f"{self.name}_ms_p50": float(np.percentile(arr, 50)),
            f"{self.name}_ms_p90": float(np.percentile(arr, 90)),
            f"{self.name}_ms_p99": float(np.percentile(arr, 99)),
            f"{self.name}_ms_mean": float(arr.mean()),
            f"{self.name}_count": len(arr),
        }


@contextlib.contextmanager
def device_trace(log_dir="/tmp/npe_tpu_trace"):
    """jax.profiler trace context: `with device_trace(): step(...)` then
    open the dir in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    """Named region inside a trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
