"""Device tracing + stage profiling.

The reference only has wall-clock metric dicts (SURVEY.md §5). TPU build
adds jax.profiler traces (TensorBoard/XProf format) around any pipeline
section plus named trace annotations per stage, so device time is
attributable to stages in the trace viewer.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

from .logging_utils import logger


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace around a block; no-op when trace_dir is falsy."""
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", trace_dir)


@contextlib.contextmanager
def stage(name: str, metrics: Optional[Dict[str, float]] = None) -> Iterator[None]:
    """Named host+device stage: wall clock into ``metrics`` and a
    TraceAnnotation visible in the device profile."""
    import jax

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    if metrics is not None:
        metrics[name] = metrics.get(name, 0.0) + time.perf_counter() - t0
