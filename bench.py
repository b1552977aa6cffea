"""Benchmark: end-to-end device work for one "page" of the OCR pipeline.

Measures the two device-dominant stages on real page-scale shapes:
  * DBNet (mobilenetv3+RSE-FPN) detection forward at 960x960
  * CTC recognition (SVTR-LCNet) forward over 64 crops of 48x320
and derives pages/sec/chip (a page ~ 1 det pass + 64 rec crops, the shape of
the reference's per-page work in ocr_system_task.py:549-734).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the ratio against the BASELINE.json north star of 50
pages/s/chip (the reference publishes no numbers — SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import time


def bench() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdf_table_tpu.engine.params import init_params
    from pdf_table_tpu.models.dbnet import DBNet, DbNetConfig
    from pdf_table_tpu.models.rec_ctc import CTCRecModel, RecConfig

    det_cfg = DbNetConfig.ppocr(dtype="bfloat16")
    det = DBNet(det_cfg)
    det_x = jnp.zeros((1, 960, 960, 3), jnp.float32)
    det_vars = init_params(det, det_x)

    rec_cfg = RecConfig(vocab_size=97, dtype="bfloat16")
    rec = CTCRecModel(rec_cfg)
    rec_x = jnp.zeros((64, 48, 320, 3), jnp.float32)
    rec_vars = init_params(rec, rec_x)

    det_fn = jax.jit(lambda v, x: det.apply(v, x, train=False)["prob"])
    rec_fn = jax.jit(lambda v, x: rec.apply(v, x, train=False))

    # warmup / compile
    jax.block_until_ready(det_fn(det_vars, det_x))
    jax.block_until_ready(rec_fn(rec_vars, rec_x))

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        p = det_fn(det_vars, det_x)
        r = rec_fn(rec_vars, rec_x)
    jax.block_until_ready((p, r))
    dt = (time.perf_counter() - t0) / n_iters

    pages_per_sec = 1.0 / dt
    return {
        "metric": "pages_per_sec_per_chip(det@960+rec64@320)",
        "value": round(pages_per_sec, 3),
        "unit": "pages/s",
        "vs_baseline": round(pages_per_sec / 50.0, 3),
    }


def main() -> int:
    try:
        result = bench()
    except Exception as e:  # never crash the driver
        result = {"metric": "pages_per_sec_per_chip(det@960+rec64@320)",
                  "value": 0.0, "unit": "pages/s", "vs_baseline": 0.0,
                  "error": f"{type(e).__name__}: {e}"}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
