"""The JAX inference-task engine.

TPU-native redesign of the reference's ``BaseInferTask``
(model/ocr_pdf/base_infer_task.py:30): instead of a pytorch/onnx dual
backend with per-input H2D copies, every task is

    host preprocess -> jit-compiled device program(s) -> host postprocess

with *bucketed static shapes*: batches are padded up to a small set of
sizes (1, 2, 4, 8, ...) so XLA compiles a handful of programs per task and
every subsequent page hits the compile cache. Parameters live on device as
a pytree (bf16 policy via engine.device.compute_dtype) and are optionally
replicated over a data-parallel mesh.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import numpy as np

from ..utils.logging_utils import logger

# Batch-size buckets: powers of two keep the compile-cache small while
# wasting <2x padding in the worst case.
BUCKET_SIZES = (1, 2, 4, 8, 16, 32, 64, 128)


def bucket_batch_size(n: int, buckets: Sequence[int] = BUCKET_SIZES) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


@dataclass
class TaskConfig:
    """Common task knobs (reference: task kwargs in BaseInferTask.__init__)."""
    model_name: str = ""
    task_type: str = ""
    lang: str = "en"
    batch_size: int = 8
    score_threshold: float = 0.5
    debug: bool = False
    output_dir: str = ""
    extra: Dict[str, Any] = field(default_factory=dict)


class InferTask:
    """Base class for all inference tasks.

    Subclasses implement:
      - ``_build_model()``      -> (apply_fn, params) ; apply_fn(params, batch)
      - ``_preprocess(inputs)`` -> host-side dict of numpy arrays (+meta)
      - ``_postprocess(raw, meta)`` -> task-specific results

    ``__call__`` wires the three stages and records per-stage timings into
    ``self.timings`` using the reference's metric-dict naming.
    """

    task_name = "base"

    def __init__(self, config: Optional[TaskConfig] = None, mesh=None):
        self.config = config or TaskConfig()
        self.mesh = mesh
        self.timings: Dict[str, List[float]] = {
            "preprocess": [], "infer": [], "postprocess": [], "total": []}
        self._apply_fn: Optional[Callable] = None
        self._params = None
        self._jitted: Dict[Any, Callable] = {}
        self._built = False
        import threading
        self._build_lock = threading.Lock()

    # -- lifecycle ---------------------------------------------------------

    def ensure_built(self) -> None:
        # double-checked locking: pipeline lanes (batch_runner) call
        # ensure_built from several worker threads; without the lock two
        # threads built the same model concurrently (observed: duplicate
        # 9 s LoreModel builds in the round-5 bench log) and raced the
        # _apply_fn/_params/_jitted assignments
        if self._built:
            return
        with self._build_lock:
            if self._built:
                return
            from .device import enable_compile_cache
            enable_compile_cache()
            t0 = time.perf_counter()
            self._apply_fn, self._params = self._build_model()
            if self.mesh is not None and self._params is not None:
                from ..parallel.mesh import replicate_params
                self._params = replicate_params(self._params, self.mesh)
            else:
                # checkpoint-restored params are host numpy; commit them
                # to device ONCE or every jitted call re-uploads the whole
                # tree over the tunnel (engine/params.commit_params)
                from .params import commit_params
                self._params = commit_params(self._params)
            self._built = True
            logger.info("[%s] model built in %.2fs", self.task_name,
                        time.perf_counter() - t0)

    def _build_model(self):
        raise NotImplementedError

    def _preprocess(self, inputs):
        raise NotImplementedError

    def _run_model(self, batch):
        """Default: single jitted apply over the whole batch dict."""
        self.ensure_built()
        key = tuple(sorted((k, v.shape, str(v.dtype))
                           for k, v in batch.items()
                           if isinstance(v, (np.ndarray, jax.Array))))
        fn = self._jitted.get(key)
        if fn is None:
            fn = jax.jit(self._apply_fn)
            self._jitted[key] = fn
        return fn(self._params, batch)

    def _postprocess(self, raw, meta):
        raise NotImplementedError

    # -- execution ---------------------------------------------------------

    def __call__(self, inputs, **kwargs):
        t_start = time.perf_counter()
        t0 = time.perf_counter()
        batch, meta = self._preprocess(inputs, **kwargs)
        self.timings["preprocess"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        raw = self._run_model(batch)
        raw = jax.block_until_ready(raw)
        self.timings["infer"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        out = self._postprocess(raw, meta)
        self.timings["postprocess"].append(time.perf_counter() - t0)
        self.timings["total"].append(time.perf_counter() - t_start)
        return out

    # -- batching helpers ----------------------------------------------------

    @staticmethod
    def pad_batch(arrays: Dict[str, np.ndarray], bucket: Optional[int] = None):
        """Pad every array's dim 0 to the bucketed batch size; returns
        (padded dict, real_n)."""
        n = next(iter(arrays.values())).shape[0]
        b = bucket if bucket is not None else bucket_batch_size(n)
        out = {}
        for k, v in arrays.items():
            if v.shape[0] == n and b > n:
                pad = [(0, b - n)] + [(0, 0)] * (v.ndim - 1)
                out[k] = np.pad(v, pad)
            else:
                out[k] = v
        return out, n

    def timing_summary(self) -> Dict[str, Dict[str, float]]:
        from ..utils.benchmark_utils import timing_stats
        return {k: timing_stats([t * 1000 for t in v])
                for k, v in self.timings.items()}

    def reset_timings(self) -> None:
        for v in self.timings.values():
            v.clear()
