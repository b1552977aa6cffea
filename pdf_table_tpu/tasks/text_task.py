"""Standalone text task: detection + recognition (+ orientation), no tables.

Reference: OcrTextTask (model/ocr_pdf/ocr_text_task.py:44, 388 LoC) — a
file-level det+rec runner with its own flag surface: PDF inputs route to
pdfminer text extraction (pdf_text_extract:248), image inputs run deskew
pre-processing (pre_process_image:198), detection (text_detection:100) and
recognition (text_recognition:161); per-stage timings land in a metric
dict and show_ocr_result (:239) renders a DataFrame of boxes + texts.

TPU shape: recognition is page-batched (width-bucket sweeps) instead of
the reference's per-box loop (:131-160).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Union

import numpy as np

from ..entity.ocr_cell import OcrCell


class OcrTextTask:
    """Flag surface mirrors the reference constructor + OCRDocumentConfig
    fields it reads: detector/recognizer choice, lang, orientation fix,
    deskew, debug/output_dir."""

    def __init__(self, detect_model: str = "PP-OCRv4_det",
                 recognizer_model: str = "PP-OCRv4_rec",
                 lang: str = "en",
                 use_orientation: bool = False,
                 deskew: bool = False,
                 debug: bool = False,
                 output_dir: Optional[str] = None,
                 mesh=None, **kw):
        from .detection import OcrDetectionTask
        from .recognition import OcrRecognitionTask

        rec_kw = {} if lang in ("en", "") else {"lang": lang}
        self.det = OcrDetectionTask(model=detect_model, mesh=mesh)
        self.rec = OcrRecognitionTask(model=recognizer_model, mesh=mesh,
                                      **rec_kw)
        self.use_orientation = use_orientation
        self.deskew = deskew
        self.debug = debug
        self.output_dir = output_dir
        self._line_cls = None
        self._pdf_text = None

    def set_output_dir(self, output_dir: str) -> None:
        self.output_dir = output_dir

    @property
    def line_cls(self):
        if self._line_cls is None and self.use_orientation:
            from .cls_pulc import ClsImagePulcTask
            self._line_cls = ClsImagePulcTask(
                task_type="textline_orientation", scale=0.25)
        return self._line_cls

    @property
    def pdf_text_task(self):
        if self._pdf_text is None:
            from .pdf_text import OcrPdfTextTask
            self._pdf_text = OcrPdfTextTask()
        return self._pdf_text

    # -- stages (named like the reference) ---------------------------------

    def pre_process_image(self, image: np.ndarray) -> np.ndarray:
        """Small-angle deskew (pre_process_image:198; rotate_image with
        morphology-based angle estimate)."""
        if not self.deskew:
            return image
        from .preprocess import estimate_skew_angle, rotate_image

        angle = estimate_skew_angle(image)
        if abs(angle) > 0.2:
            image = rotate_image(image, angle)
        return image

    def text_detection(self, image: np.ndarray) -> Dict[str, Any]:
        return self.det(image)

    def text_recognition(self, image: np.ndarray,
                         quads: np.ndarray) -> Dict[str, Any]:
        from ..ops.warp import crop_rotated_boxes

        crops = [np.asarray(c)
                 for c in crop_rotated_boxes(image, quads, None)]
        if self.use_orientation and self.line_cls is not None and crops:
            fixed = []
            for c, r in zip(crops, self.line_cls.batch_infer(crops)):
                if r.get("label") == "180_degree" \
                        and r.get("score", 0) > 0.75:
                    c = np.ascontiguousarray(c[::-1, ::-1])
                fixed.append(c)
            crops = fixed
        return self.rec(crops)

    def pdf_text_extract(self, pdf_page, scale: float = 1.0
                         ) -> List[OcrCell]:
        return self.pdf_text_task(pdf_page, scale=scale)

    def show_ocr_result(self, cells: List[OcrCell]):
        """DataFrame view (show_ocr_result:239)."""
        import pandas as pd

        rows = [[i, c.text,
                 ",".join(str(v) for v in np.asarray(
                     c.poly if c.poly is not None else c.bbox).reshape(-1))]
                for i, c in enumerate(cells)]
        return pd.DataFrame(rows, columns=["index", "text", "bbox"])

    # -- entry -------------------------------------------------------------

    def __call__(self, inputs: Union[np.ndarray, str], pdf_page=None,
                 page: int = 0, **kw) -> Dict[str, Any]:
        """inputs: image ndarray, image file path, or (with ``pdf_page``)
        a digital page whose text comes from vector data. Returns cells +
        texts + per-stage metric dict (reference metric schema)."""
        t0 = time.time()
        metric: Dict[str, Any] = {"page": page}

        if pdf_page is not None and getattr(pdf_page, "texts", None):
            t = time.time()
            cells = self.pdf_text_extract(pdf_page, scale=kw.get(
                "scale", 1.0))
            metric["pdf_text"] = time.time() - t
            metric["use_time"] = time.time() - t0
            return {"cells": cells, "texts": [c.text for c in cells],
                    "det": None, "metric": metric}

        image = inputs
        if isinstance(inputs, str):
            import cv2
            image = cv2.cvtColor(cv2.imread(inputs), cv2.COLOR_BGR2RGB)

        t = time.time()
        image = self.pre_process_image(image)
        metric["preprocess"] = time.time() - t

        t = time.time()
        det_out = self.text_detection(image)
        metric["detection"] = time.time() - t
        quads = det_out["det_polygons"].reshape(-1, 4, 2)
        if not len(quads):
            metric["use_time"] = time.time() - t0
            return {"cells": [], "texts": [], "det": det_out,
                    "metric": metric}

        t = time.time()
        rec_out = self.text_recognition(image, quads)
        metric["recognition"] = time.time() - t

        cells = [OcrCell.from_poly(q, text=tx, score=s)
                 for q, tx, s in zip(quads, rec_out["texts"],
                                     rec_out["scores"])]
        metric["n_boxes"] = len(cells)
        metric["use_time"] = time.time() - t0
        result = {"cells": cells, "texts": rec_out["texts"],
                  "det": det_out, "metric": metric}
        if self.debug and self.output_dir:
            import json
            import os
            os.makedirs(self.output_dir, exist_ok=True)
            with open(os.path.join(self.output_dir,
                                   f"text_task_{page}.json"), "w",
                      encoding="utf-8") as f:
                json.dump({"texts": rec_out["texts"],
                           "metric": metric}, f, ensure_ascii=False,
                          default=str)
        return result
