"""OcrSystemTask — the per-page pipeline orchestrator.

Reference: model/ocr_pdf/ocr_system_task.py:42 (__call__ :549-734). Stages:
rasterize/pre-process -> layout analysis -> table structure -> text
(digital-PDF extract or det+rec) -> table HTML -> page HTML, with per-stage
wall-clock metrics in the reference's metric-dict naming
(ocr_system_task.py:646-660).

TPU-native differences: sub-tasks are jit-compiled bucketed programs;
recognition is batched per page (not per box); rasterization comes from the
in-tree renderer (no Ghostscript subprocess).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..entity.enums import HtmlContentType
from ..entity.ocr_cell import OcrCell
from ..utils.logging_utils import logger
from .output import OcrSystemModelOutput


@dataclass
class OcrSystemConfig:
    """Routing flags (reference OCRDocumentConfig,
    configuration_ocr_document.py:22)."""

    detect_model: str = "PP-OCRv4_det"
    recognizer_model: str = "PP-OCRv4_rec"
    layout_model: str = "picodet"           # picodet | docx_layout | none
    table_structure_model: str = "Lore"     # Lore | SLANet | CenterNet | ...
    lang: str = "en"
    task_type: str = "general"
    use_layout: bool = True
    use_table: bool = True
    pdf_text_prefer: bool = True            # digital PDFs: extract text, skip OCR
    use_orientation_cls: bool = True        # PULC 0/90/180/270 fix for images
    use_textline_cls: bool = True           # per-box 0/180 majority page vote
    render_dpi: int = 144
    debug: bool = False
    output_dir: str = ""


def widen_table_regions(layout_cells, table_bboxes, image_width: int,
                        diff: int = 5):
    """Widen tight layout table boxes to the page's text-column extents
    (get_table_bbox_regions, table_common.py:1353): the reference takes
    min/max x of confident text blocks and stretches every table/figure
    region to cover them, +diff padding, so line-based cell extractors
    see the full frame."""
    from ..entity.enums import HtmlContentType

    xs_min, xs_max = [], []
    for c in layout_cells:
        if c.cell_type == HtmlContentType.TXT and c.score >= 0.7:
            xs_min.append(min(c.x1, c.x2))
            xs_max.append(max(c.x1, c.x2))
    min_x = min(xs_min) if xs_min else diff
    max_x = max(xs_max) if xs_max else image_width - diff
    out = []
    for x1, y1, x2, y2 in table_bboxes:
        out.append((min(x1, min_x) - diff, y1 - diff,
                    max(x2, max_x) + diff, y2 + diff))
    return out


def filter_figure_tables(layout_cells, table_bboxes,
                         score_threshold: float = 0.8):
    """Drop table regions that sit inside a confident 'figure' layout
    detection — pictures misdetected as tables (reference
    filter_layout_figure, table_common.py:1261, applied at
    ocr_table_to_html_task.py:110-129)."""
    figures = [c for c in layout_cells
               if getattr(c, "label", "") == "figure"
               and c.score >= score_threshold]
    if not figures:
        return list(table_bboxes)

    def inside(tb, fb, diff=2.0):
        return (fb[0] - diff <= tb[0] and fb[1] - diff <= tb[1]
                and tb[2] <= fb[2] + diff and tb[3] <= fb[3] + diff)

    return [tb for tb in table_bboxes
            if not any(inside(tb, f.bbox) for f in figures)]


class OcrSystemTask:
    """Per-page engine. Call with a raster image (HWC uint8 RGB) and/or a
    pdfio PdfPage; returns OcrSystemModelOutput."""

    def __init__(self, config: Optional[OcrSystemConfig] = None, mesh=None):
        self.config = config or OcrSystemConfig()
        self.mesh = mesh
        self._det = None
        self._rec = None
        self._layout = None
        self._tsr = None
        self._pdf_text = None
        self._table_html = None
        self._to_html = None

    # -- lazy sub-tasks (reference init_ocr_model, ocr_system_task.py:116) --

    @property
    def det_task(self):
        if self._det is None:
            from ..tasks.detection import OcrDetectionTask
            self._det = OcrDetectionTask(model=self.config.detect_model,
                                         mesh=self.mesh)
        return self._det

    @property
    def rec_task(self):
        if self._rec is None:
            from ..tasks.recognition import OcrRecognitionTask
            self._rec = OcrRecognitionTask(model=self.config.recognizer_model,
                                           lang=self.config.lang,
                                           mesh=self.mesh)
        return self._rec

    @property
    def layout_task(self):
        if self._layout is None and self.config.use_layout \
                and self.config.layout_model != "none":
            try:
                from ..tasks.layout import OcrLayoutTask
                self._layout = OcrLayoutTask(model=self.config.layout_model,
                                             lang=self.config.lang,
                                             mesh=self.mesh)
            except ImportError:
                logger.warning("layout task unavailable; skipping layout")
        return self._layout

    @property
    def tsr_task(self):
        if self._tsr is None and self.config.use_table:
            try:
                from ..tasks.table_structure import OcrTableStructureTask
                self._tsr = OcrTableStructureTask(
                    model=self.config.table_structure_model, mesh=self.mesh)
            except ImportError:
                logger.warning("TSR task unavailable; skipping tables")
        return self._tsr

    @property
    def preprocess_task(self):
        if getattr(self, "_preprocess", None) is None:
            from ..tasks.preprocess import OcrTablePreprocessTask
            self._preprocess = OcrTablePreprocessTask(
                use_orientation_cls=self.config.use_orientation_cls)
        return self._preprocess

    @property
    def textline_cls_task(self):
        if getattr(self, "_line_cls", None) is None \
                and self.config.use_textline_cls:
            from ..tasks.cls_pulc import ClsImagePulcTask
            self._line_cls = ClsImagePulcTask(
                task_type="textline_orientation", mesh=self.mesh)
        return getattr(self, "_line_cls", None)

    @property
    def pdf_text_task(self):
        if self._pdf_text is None:
            from ..tasks.pdf_text import OcrPdfTextTask
            self._pdf_text = OcrPdfTextTask()
        return self._pdf_text

    @property
    def table_html_task(self):
        if self._table_html is None:
            from ..tasks.table_to_html import OcrTableToHtmlTask
            self._table_html = OcrTableToHtmlTask()
        return self._table_html

    @property
    def to_html_task(self):
        if self._to_html is None:
            from ..tasks.to_html import OcrToHtmlTask
            self._to_html = OcrToHtmlTask()
        return self._to_html

    # -- stages -------------------------------------------------------------

    def text_detection(self, image: np.ndarray) -> List[np.ndarray]:
        out = self.det_task(image)
        return list(out["det_polygons"].reshape(-1, 4, 2))

    def image_orientation_fix(self, image: np.ndarray,
                              score_threshold: float = 0.9):
        """Image pages: det-box aspect rotate90 check + batched per-box
        0/180 PULC majority vote that rotates the WHOLE page (reference
        image_pre_process, ocr_system_task.py:460-479, and
        text_line_orientation :395-439 — which loops one PULC forward per
        box; here all crops classify in one padded device batch).
        Returns (image, quads or None, degrees_rotated)."""
        quads = self.text_detection(image)
        rotated = 0
        if len(quads):
            q = np.asarray(quads)
            widths = np.abs(q[:, 0, 0] - q[:, 2, 0])
            heights = np.abs(q[:, 0, 1] - q[:, 2, 1])
            if heights.sum() > 0 and widths.sum() / heights.sum() < 1.0:
                # most boxes taller than wide: page authored rotated
                # (check_pdf_text_need_rotate90, table_common.py:1617-1640)
                image = np.ascontiguousarray(np.rot90(image, k=1))
                rotated = 90
                quads = self.text_detection(image)
        cls_task = self.textline_cls_task
        if cls_task is not None and len(quads):
            from ..ops.warp import crop_rotated_boxes
            crops = crop_rotated_boxes(image, np.asarray(quads), None)
            res = cls_task.batch_infer([np.asarray(c) for c in crops])
            v0 = sum(1 for r in res if r["score"] > score_threshold
                     and r["label"] == "0_degree")
            v180 = sum(1 for r in res if r["score"] > score_threshold
                       and r["label"] == "180_degree")
            if v180 > v0:
                image = np.ascontiguousarray(np.rot90(image, k=2))
                rotated += 180
                quads = None    # stale after the flip; re-detect lazily
        return image, quads, rotated

    def text_recognition(self, image: np.ndarray,
                         quads: Sequence[np.ndarray]) -> List[OcrCell]:
        if not len(quads):
            return []
        from ..ops.warp import crop_rotated_boxes
        crops = crop_rotated_boxes(image, np.asarray(quads), None)
        res = self.rec_task([np.asarray(c) for c in crops])
        cells = []
        for quad, text, score in zip(quads, res["texts"], res["scores"]):
            cell = OcrCell.from_poly(np.asarray(quad), text=text, score=score)
            cells.append(cell)
        return cells

    def layout_analysis(self, image: np.ndarray) -> List[OcrCell]:
        task = self.layout_task
        if task is None:
            return []
        return task(image).get("layout_cells", [])

    def table_structure(self, image: np.ndarray,
                        table_bbox: Tuple[float, float, float, float]):
        task = self.tsr_task
        if task is None:
            return None
        x1, y1, x2, y2 = [int(round(v)) for v in table_bbox]
        x1, y1 = max(0, x1), max(0, y1)
        crop = image[y1:y2, x1:x2]
        if crop.size == 0:
            return None
        result = task(crop)
        result["offset"] = (x1, y1)
        return result

    # -- main ---------------------------------------------------------------

    def __call__(self, image: Optional[np.ndarray] = None, pdf_page=None,
                 pdf_doc=None, page: int = 0,
                 src_id: str = "") -> OcrSystemModelOutput:
        cfg = self.config
        out = OcrSystemModelOutput(src_id=src_id, page=page,
                                   is_pdf=pdf_page is not None)
        metric: Dict[str, float] = {}

        t0 = time.time()
        if image is None and pdf_page is not None:
            from ..pdfio.render import render_page
            image = render_page(pdf_doc, pdf_page, dpi=cfg.render_dpi)
        if image is None:
            raise ValueError("need image and/or pdf_page")
        pdf_text_ok = pdf_page is not None
        if pdf_page is not None:
            from ..tasks.pdf_text import check_pdf_text_need_rotate90
            if check_pdf_text_need_rotate90(pdf_page):
                # page authored rotated: fix the raster, use OCR for text
                # (reference check_pdf_text_need_rotate90 flow,
                # ocr_system_task.py:461 + table_common.py:1617)
                image = np.ascontiguousarray(np.rot90(image, k=3))
                out.rotate_angle = 90.0
                pdf_text_ok = False
        pre = self.preprocess_task(image, is_pdf=pdf_page is not None)
        image = pre["image"]
        out.rotate_angle = pre["rotate_angle"]
        cached_quads = None
        if pdf_page is None and cfg.use_textline_cls:
            t_cls = time.time()
            image, cached_quads, deg = self.image_orientation_fix(image)
            if deg:
                out.rotate_angle = (out.rotate_angle or 0.0) + deg
            metric["textline_orientation"] = time.time() - t_cls
        out.image = image
        out.image_shape = image.shape[:2]
        if pdf_page is not None and pdf_page.height > 0:
            out.pdf_scale = image.shape[0] / pdf_page.height
        metric["image_pre_process"] = time.time() - t0

        # layout
        t0 = time.time()
        layout_cells = self.layout_analysis(image) if cfg.use_layout else []
        out.layout_cells = layout_cells
        metric["layout"] = time.time() - t0

        table_bboxes = filter_figure_tables(
            layout_cells, [c.bbox for c in layout_cells
                           if c.cell_type == HtmlContentType.TABLE])
        if table_bboxes and self.config.table_structure_model in (
                "LineCell", "LineCellPdf"):
            # the OpenCV/vector cell extractors need the FULL table frame:
            # widen tight layout boxes to the page's text-column extents
            # so border lines at the region edge survive the crop
            # (get_table_bbox_regions, table_common.py:1353)
            table_bboxes = widen_table_regions(
                layout_cells, table_bboxes, image.shape[1])

        # table structure per table region
        t0 = time.time()
        table_results = []
        if cfg.use_table:
            if pdf_text_ok and pdf_page.segs is not None \
                    and (pdf_page.segs or pdf_page.rects):
                # digital PDF: exact wired-table cells from vector lines
                # (LineCellPdf path; regions from layout or line clusters)
                from ..models.line_cell import extract_cells_from_pdf_page
                from ..models.line_cell.from_pdf import detect_table_regions
                from ..tasks.pdf_text import table_bbox_is_pdf_image
                if table_bboxes:
                    for tb in table_bboxes:
                        if table_bbox_is_pdf_image(tb, pdf_page,
                                                   out.pdf_scale):
                            continue   # figure misdetected as table
                        r = extract_cells_from_pdf_page(
                            pdf_page, out.pdf_scale, bbox=tb)
                        if r["cells"]:
                            r["offset"] = (0, 0)
                            table_results.append((tb, r))
                if not table_results:
                    # layout missed the table or proposed a lineless
                    # region: the page's own line clusters are ground
                    # truth for a digital page (mirrors
                    # batch_runner._digital_tables)
                    for region in detect_table_regions(pdf_page,
                                                       out.pdf_scale):
                        r = {"cells": region["cells"],
                             "type": "line_cell_pdf", "offset": (0, 0)}
                        table_results.append((region["bbox"], r))
            elif table_bboxes and self.tsr_task is not None \
                    and hasattr(self.tsr_task, "batch_infer"):
                # all table crops of the page in one device forward
                crops, kept = [], []
                for tb in table_bboxes:
                    x1, y1, x2, y2 = [int(round(v)) for v in tb]
                    crop = image[max(0, y1):y2, max(0, x1):x2]
                    if crop.size:
                        crops.append(crop)
                        kept.append((tb, (max(0, x1), max(0, y1))))
                for (tb, offset), r in zip(kept,
                                           self.tsr_task.batch_infer(crops)):
                    r["offset"] = offset
                    table_results.append((tb, r))
            else:
                for tb in table_bboxes:
                    r = self.table_structure(image, tb)
                    if r is not None:
                        table_results.append((tb, r))
        out.table_structures = [r for _, r in table_results]
        metric["table_structure"] = time.time() - t0

        # text: digital-PDF extract or det+rec
        t0 = time.time()
        if pdf_text_ok and cfg.pdf_text_prefer and pdf_page.texts:
            out.text_cells = self.pdf_text_task(pdf_page, out.pdf_scale)
            metric["pdf_text_extract"] = time.time() - t0
        else:
            quads = cached_quads if cached_quads is not None \
                else self.text_detection(image)
            metric["detection"] = time.time() - t0
            t0 = time.time()
            cells = self.text_recognition(image, quads)
            from ..tasks.to_html import merge_overlapping_cells
            out.text_cells = merge_overlapping_cells(cells)
            metric["recognition"] = time.time() - t0

        # table -> html
        t0 = time.time()
        table_regions = []
        for tb, r in table_results:
            html = self.table_html_task(r, out.text_cells)
            out.table_html.append(html)
            table_regions.append((tb, html))
        metric["table_html"] = time.time() - t0

        # page html
        t0 = time.time()
        out.page_html = self.to_html_task(
            out.text_cells, table_regions,
            page_width=float(image.shape[1]))
        metric["ocr_html"] = time.time() - t0

        out.metric = metric
        if cfg.debug:
            from ..utils.debug_render import render_debug_overlay
            out.debug["render"] = render_debug_overlay(
                image, out.text_cells, out.layout_cells, table_results)
            logger.info("page %s metrics: %s", page,
                        {k: round(v, 3) for k, v in metric.items()})
        return out

    # -- batch over pages (reference ocr(), ocr_system_task.py:736) ---------

    def ocr(self, pages: Sequence[Dict[str, Any]]) -> List[OcrSystemModelOutput]:
        results = []
        for i, p in enumerate(pages):
            results.append(self(image=p.get("image"),
                                pdf_page=p.get("pdf_page"),
                                pdf_doc=p.get("pdf_doc"),
                                page=p.get("page", i),
                                src_id=p.get("src_id", "")))
        return results

    @staticmethod
    def timing_summary(results: Sequence[OcrSystemModelOutput]
                       ) -> Dict[str, Dict[str, float]]:
        """Per-stage latency stats over a page batch (reference per-stage
        timing aggregation, ocr_system_task.py:736-791 +
        print_timings schema)."""
        from ..utils.benchmark_utils import timing_stats

        stages: Dict[str, List[float]] = {}
        for r in results:
            for k, v in r.metric.items():
                stages.setdefault(k, []).append(v * 1000.0)
        return {k: timing_stats(v) for k, v in stages.items()}
