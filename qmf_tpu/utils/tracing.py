"""Profiling / tracing hooks.

The reference's only observability was per-bucket wall-time logs
(reference distributed/scheduler/Connection.cpp:296-298) and byte-level
VLOG traces (SURVEY.md section 5.1). Here profiling is first-class:

- :func:`trace` — context manager around ``jax.profiler`` trace capture,
  viewable in TensorBoard/XProf (QMF_TPU_TRACE_DIR or explicit path).
- :func:`annotate` — named ``TraceAnnotation`` regions so epochs /
  half-epochs show up labeled on the device timeline.
- :class:`StepTimer` — lightweight wall-clock records, the moral upgrade of
  the reference's "time cost N secs" log lines, queryable after a run.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional, Tuple

from qmf_tpu.utils.logging import log


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None):
    """Capture a jax.profiler trace around the enclosed block."""
    trace_dir = trace_dir or os.environ.get("QMF_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", trace_dir)


@contextlib.contextmanager
def annotate(name: str):
    """Label a region on the profiler timeline (no-op cost when untraced)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Named wall-clock records: ``with timer.measure("epoch"): ...``."""

    def __init__(self):
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.records.setdefault(name, []).append(time.time() - t0)

    def summary(self) -> Dict[str, Tuple[int, float, float]]:
        """{name: (count, total_s, mean_s)}"""
        return {
            k: (len(v), sum(v), sum(v) / len(v))
            for k, v in self.records.items()
        }

    def log_summary(self) -> None:
        for name, (n, total, mean) in sorted(self.summary().items()):
            log.info("timing %s: n=%d total=%.3fs mean=%.4fs", name, n, total, mean)
