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


# -- fine-grained lane tracing (env-gated) ------------------------------------

# PDFTABLE_LANE_TRACE=1 turns sub-stage accumulators inside the hot lane
# functions (layout batch_finish, TSR _lore_infer_from_pages) into real
# measurements; off, each site costs one env lookup. tools/exp.py's
# "lanes" experiment drains this to attribute per-chunk wall time.
import threading

trace_stats: Dict[str, float] = {}
_trace_lock = threading.Lock()


def trace_acc(key: str, dt: float) -> None:
    if os.environ.get("PDFTABLE_LANE_TRACE", "0") != "1":
        return
    with _trace_lock:
        trace_stats[key] = trace_stats.get(key, 0.0) + dt


def drain_trace() -> Dict[str, float]:
    with _trace_lock:
        out = dict(trace_stats)
        trace_stats.clear()
    return out


# (label, t_start, t_end) wall-clock spans, e.g. "tsr_lane:3" = chunk 3's
# TSR lane. Drives tools/exp.py's "timeline" critical-path view.
trace_events: list = []


def trace_event(label: str, t0: float, t1: float) -> None:
    if os.environ.get("PDFTABLE_LANE_TRACE", "0") != "1":
        return
    with _trace_lock:
        trace_events.append((label, t0, t1))


def drain_events() -> list:
    with _trace_lock:
        out = list(trace_events)
        trace_events.clear()
    return out


# -- program registry (MFU / device-ceiling accounting) ----------------------

# name -> TrackedProgram. Populated by track_program() at the hot-path jit
# sites; bench.py walks it to compute per-program FLOPs
# (Lowered.cost_analysis, no recompile) and device-only execution time.
program_registry: Dict[str, "TrackedProgram"] = {}


class TrackedProgram:
    """Thin wrapper over a jitted callable: counts calls and keeps the
    LARGEST call's arg ShapeDtypeStructs (always) and, when
    PDFTABLE_TRACK_PROGRAMS=1, that call's REAL args — so a bench probe
    can re-execute the exact program for device-only timing. "Largest"
    = max total elements across array args: one registry name covers
    every batch-bucket instantiation, and the FIRST call is typically a
    tiny warm-up batch — probing it understated the production cost 14x
    for the TSR trunk (round-5 device trace: 15 vs 214 ms/call at
    nb=16). Holding real args pins device memory; production leaves the
    env unset and pays only a size check per call."""

    __slots__ = ("name", "fn", "calls", "arg_specs", "args", "_size")

    def __init__(self, name: str, fn):
        self.name = name
        self.fn = fn
        self.calls = 0
        self.arg_specs = None
        self.args = None
        self._size = -1

    @staticmethod
    def _total_elems(args) -> int:
        import jax

        return sum(
            int(x.size) if hasattr(x, "size") and hasattr(x, "shape")
            else 0 for x in jax.tree.leaves(args))

    def __call__(self, *args):
        self.calls += 1
        track = os.environ.get("PDFTABLE_TRACK_PROGRAMS", "0") == "1"
        # the per-call size walk only runs under the bench env; plain
        # production keeps the first call's specs and pays one branch
        if self.arg_specs is None or \
                (track and self._total_elems(args) > self._size):
            import jax

            if track:
                self._size = self._total_elems(args)
                self.args = args
            self.arg_specs = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(getattr(x, "shape", ()),
                                               getattr(x, "dtype", None))
                if hasattr(x, "shape") else x, args)
        return self.fn(*args)

    def lower(self, *args, **kw):
        return self.fn.lower(*args, **kw)

    def flops(self) -> Optional[float]:
        """Analytic FLOPs of the traced program. Prefers the jaxpr walk
        (utils/flops.py — works everywhere, no compile); falls back to
        XLA HLO cost analysis where the client supports it."""
        if self.arg_specs is None:
            return None
        try:
            from .flops import fn_flops

            return fn_flops(self.fn, *self.arg_specs) or None
        except Exception:
            pass
        try:
            cost = self.fn.lower(*self.arg_specs).cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0)) or None
        except Exception:
            return None


def track_program(name: str, fn) -> TrackedProgram:
    """Wrap+register a freshly jitted program under ``name`` (include the
    shape key: one entry per compiled specialization)."""
    tp = TrackedProgram(name, fn)
    program_registry[name] = tp
    return tp
