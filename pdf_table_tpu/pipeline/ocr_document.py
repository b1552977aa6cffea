"""Legacy simple orchestrator: detection + recognition only.

Reference: OcrDocument (model/ocr_pdf/modeling_ocr_pdf.py:37). Kept for API
parity; delegates to the batched text task.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


class OcrDocument:
    def __init__(self, detect_model: str = "PP-OCRv4_det",
                 recognizer_model: str = "PP-OCRv4_rec", **kw):
        from ..tasks.text_task import OcrTextTask

        self.task = OcrTextTask(detect_model=detect_model,
                                recognizer_model=recognizer_model, **kw)

    def __call__(self, image: np.ndarray) -> Dict[str, Any]:
        out = self.task(image)
        return {
            "polygons": np.asarray([c.poly.reshape(-1) for c in out["cells"]
                                    if c.poly is not None],
                                   np.float32).reshape(-1, 8),
            "text": out["texts"],
            "cells": out["cells"],
        }
