"""Standalone text task: detection + recognition (+ orientation), no tables.

Reference: OcrTextTask (model/ocr_pdf/ocr_text_task.py:44).
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from ..entity.ocr_cell import OcrCell


class OcrTextTask:
    def __init__(self, detect_model: str = "PP-OCRv4_det",
                 recognizer_model: str = "PP-OCRv4_rec",
                 use_orientation: bool = False, mesh=None, **kw):
        from .detection import OcrDetectionTask
        from .recognition import OcrRecognitionTask

        self.det = OcrDetectionTask(model=detect_model, mesh=mesh)
        self.rec = OcrRecognitionTask(model=recognizer_model, mesh=mesh)
        self.use_orientation = use_orientation
        self._line_cls = None

    @property
    def line_cls(self):
        if self._line_cls is None and self.use_orientation:
            from .cls_pulc import ClsImagePulcTask
            self._line_cls = ClsImagePulcTask(
                task_type="textline_orientation", scale=0.25)
        return self._line_cls

    def __call__(self, image: np.ndarray) -> Dict[str, Any]:
        from ..ops.warp import crop_rotated_boxes

        det_out = self.det(image)
        quads = det_out["det_polygons"].reshape(-1, 4, 2)
        if not len(quads):
            return {"cells": [], "texts": [], "det": det_out}
        crops = [np.asarray(c) for c in crop_rotated_boxes(image, quads, None)]
        if self.use_orientation and self.line_cls is not None:
            fixed = []
            for c in crops:
                r = self.line_cls(c)
                if r.get("label") == "180_degree" and r.get("score", 0) > 0.75:
                    c = np.ascontiguousarray(c[::-1, ::-1])
                fixed.append(c)
            crops = fixed
        rec_out = self.rec(crops)
        cells: List[OcrCell] = []
        for quad, text, score in zip(quads, rec_out["texts"],
                                     rec_out["scores"]):
            cells.append(OcrCell.from_poly(quad, text=text, score=score))
        return {"cells": cells, "texts": rec_out["texts"], "det": det_out}
