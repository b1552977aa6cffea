"""Standalone table task: TSR on a table image + HTML/xlsx export + eval.

Reference: OcrTableTask (model/ocr_pdf/ocr_table_task.py:36, to_excel :29,
eval_table :222).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np


class OcrTableTask:
    def __init__(self, table_structure_model: str = "Lore",
                 task_type: str = "wtw", ocr_task=None, mesh=None, **kw):
        from .table_structure import OcrTableStructureTask

        self.tsr = OcrTableStructureTask(model=table_structure_model,
                                         task_type=task_type, mesh=mesh, **kw)
        self._ocr = ocr_task

    @property
    def ocr(self):
        if self._ocr is None:
            from .text_task import OcrTextTask
            self._ocr = OcrTextTask()
        return self._ocr

    def __call__(self, image: np.ndarray,
                 run_ocr: bool = True) -> Dict[str, Any]:
        from .table_to_html import OcrTableToHtmlTask

        tsr_result = self.tsr(image)
        tsr_result.setdefault("offset", (0, 0))
        text_cells = self.ocr(image)["cells"] if run_ocr else []
        html = OcrTableToHtmlTask()(tsr_result, text_cells)
        return {"tsr": tsr_result, "html": html, "text_cells": text_cells}

    @staticmethod
    def to_excel(html: str, path: str) -> str:
        from ..utils.xlsx_writer import html_table_to_xlsx

        html_table_to_xlsx(html, path)
        return path

    @staticmethod
    def eval_table(pred_htmls: Sequence[str], gt_htmls: Sequence[str],
                   structure_only: bool = False, n_jobs: int = 1) -> Dict[str, Any]:
        from ..eval.teds import TEDS

        teds = TEDS(structure_only=structure_only, n_jobs=n_jobs)
        scores = teds.batch_evaluate(list(pred_htmls), list(gt_htmls))
        return {"teds": float(np.mean(scores)) if scores else 0.0,
                "scores": scores}
