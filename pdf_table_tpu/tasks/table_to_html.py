"""Table -> HTML: match OCR/pdf text to structure cells, emit <table> HTML.

Reference: OcrTableToHtmlTask (model/ocr_pdf/ocr_table_to_html_task.py:31) —
find_top1_mach_box:48 (containment, then IoU + center-distance fallback),
match_table_cell_and_text_cell:178, get_one_cell_text:297 (reading-order
sort inside a cell) — and TableProcessUtils.cell_to_html
(model/pdf_table/table_common.py:578) for the rowspan/colspan grid walk.

TSR result schema consumed here: {"cells": [ {"bbox": [x1,y1,x2,y2],
"logic": [row_s, row_e, col_s, col_e]} ], "offset": (x, y)} — bbox in crop
coords, offset maps back to page coords.
"""

from __future__ import annotations

import html as html_mod
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..entity.ocr_cell import OcrCell


def bbox_iou(a: Sequence[float], b: Sequence[float]) -> float:
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(0.0, ix2 - ix1), max(0.0, iy2 - iy1)
    inter = iw * ih
    if inter <= 0:
        return 0.0
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-9)


def overlap_ratio(text_bbox: Sequence[float], cell_bbox: Sequence[float]) -> float:
    """Fraction of the text box inside the cell."""
    ix1, iy1 = max(text_bbox[0], cell_bbox[0]), max(text_bbox[1], cell_bbox[1])
    ix2, iy2 = min(text_bbox[2], cell_bbox[2]), min(text_bbox[3], cell_bbox[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    area = max((text_bbox[2] - text_bbox[0]) * (text_bbox[3] - text_bbox[1]), 1e-9)
    return inter / area


def find_top1_match(text_cell: OcrCell,
                    cell_bboxes: Sequence[Sequence[float]]) -> Optional[int]:
    """Best structure cell for a text box: containment first, then max
    overlap ratio, then nearest center (reference find_top1_mach_box:48)."""
    m = assign_texts_to_cells([text_cell], cell_bboxes)
    return m[0]


def assign_texts_to_cells(text_cells: Sequence[OcrCell],
                          cell_bboxes: Sequence[Sequence[float]]
                          ) -> List[Optional[int]]:
    """Vectorized find_top1_match over all text boxes at once (the
    per-page matcher is host-side hot: T texts x C cells python loops cost
    ~20 ms/page at bench volume)."""
    if not len(cell_bboxes) or not len(text_cells):
        return [None] * len(text_cells)
    tb = np.asarray([t.bbox for t in text_cells], np.float32)     # (T, 4)
    cb = np.asarray(cell_bboxes, np.float32)                      # (C, 4)
    ix1 = np.maximum(tb[:, None, 0], cb[None, :, 0])
    iy1 = np.maximum(tb[:, None, 1], cb[None, :, 1])
    ix2 = np.minimum(tb[:, None, 2], cb[None, :, 2])
    iy2 = np.minimum(tb[:, None, 3], cb[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    area_t = np.maximum((tb[:, 2] - tb[:, 0]) * (tb[:, 3] - tb[:, 1]),
                        1e-9)
    ov = inter / area_t[:, None]                                  # (T, C)
    best = np.argmax(ov, axis=1)
    best_ov = ov[np.arange(len(tb)), best]
    # fallback: nearest center among cells with any overlap
    tc = (tb[:, :2] + tb[:, 2:]) / 2
    cc = (cb[:, :2] + cb[:, 2:]) / 2
    d = np.abs(tc[:, None, 0] - cc[None, :, 0]) \
        + np.abs(tc[:, None, 1] - cc[None, :, 1])
    d = np.where(ov > 0, d, np.inf)
    near = np.argmin(d, axis=1)
    near_ok = np.isfinite(d[np.arange(len(tb)), near])
    out: List[Optional[int]] = []
    for i in range(len(tb)):
        if best_ov[i] >= 0.5:
            out.append(int(best[i]))
        elif near_ok[i]:
            out.append(int(near[i]))
        else:
            out.append(None)
    return out


def sort_reading_order(cells: List[OcrCell]) -> List[OcrCell]:
    """Top-to-bottom lines, left-to-right within a line
    (reference get_one_cell_text:297)."""
    if not cells:
        return []
    out = sorted(cells, key=lambda c: (c.y1, c.x1))
    lines: List[List[OcrCell]] = []
    for c in out:
        for line in lines:
            ref = line[-1]
            inter = min(c.y2, ref.y2) - max(c.y1, ref.y1)
            if inter / max(1e-6, min(c.height, ref.height)) >= 0.5:
                line.append(c)
                break
        else:
            lines.append([c])
    result = []
    for line in sorted(lines, key=lambda l: min(c.y1 for c in l)):
        result.extend(sorted(line, key=lambda c: c.x1))
    return result


def cells_to_html(cells: List[Dict[str, Any]],
                  texts: Optional[List[str]] = None,
                  border: int = 1) -> str:
    """Grid walk with rowspan/colspan (reference cell_to_html,
    table_common.py:578). ``cells`` need 'logic' [rs, re, cs, ce]."""
    if not cells:
        return "<table></table>"
    n_rows = max(int(c["logic"][1]) for c in cells) + 1
    n_cols = max(int(c["logic"][3]) for c in cells) + 1
    occupied = np.zeros((n_rows, n_cols), bool)
    # index cells by start position
    start_map: Dict[Tuple[int, int], int] = {}
    for i, c in enumerate(cells):
        rs, re, cs, ce = [int(v) for v in c["logic"]]
        start_map.setdefault((rs, cs), i)
    rows_html: List[str] = []
    for r in range(n_rows):
        tds: List[str] = []
        for col in range(n_cols):
            if occupied[r, col]:
                continue
            i = start_map.get((r, col))
            if i is None:
                if not occupied[r, col]:
                    tds.append("<td></td>")
                    occupied[r, col] = True
                continue
            rs, re, cs, ce = [int(v) for v in cells[i]["logic"]]
            rowspan = re - rs + 1
            colspan = ce - cs + 1
            occupied[rs:re + 1, cs:ce + 1] = True
            attrs = ""
            if rowspan > 1:
                attrs += f" rowspan=\"{rowspan}\""
            if colspan > 1:
                attrs += f" colspan=\"{colspan}\""
            content = texts[i] if texts is not None else cells[i].get("text", "")
            tds.append(f"<td{attrs}>{content}</td>")
        rows_html.append("<tr>" + "".join(tds) + "</tr>")
    battr = f" border=\"{border}\"" if border else ""
    return f"<table{battr}><tbody>" + "".join(rows_html) + "</tbody></table>"


class OcrTableToHtmlTask:
    """(tsr_result, page text cells) -> HTML table string.

    Cell-path results ({'cells': [{'bbox','logic'}]}) go through logical-grid
    assembly; token-path results ({'structure_tokens', 'cells'} from
    SLANet/TableMaster) go through TableMatch (reference
    match_table_structure_and_text_cell, ocr_table_to_html_task.py:245)."""

    def __init__(self, ocr_post_process: bool = False):
        # per-cell OCR text fixes (lone O->0, separator dots) before
        # weaving into HTML (reference match_table_cell_and_text_cell's
        # ocr_post_process flag, ocr_table_to_html_task.py:178)
        self.ocr_post_process = ocr_post_process

    def _fix(self, text: str) -> str:
        if not self.ocr_post_process:
            return text
        from .ocr_fixes import ocr_post_process
        return ocr_post_process(text)

    def __call__(self, tsr_result: Dict[str, Any],
                 text_cells: Sequence[OcrCell]) -> str:
        if tsr_result.get("structure_tokens"):
            return self._token_path(tsr_result, text_cells)
        cells = tsr_result.get("cells", [])
        if not cells or not any("logic" in c for c in cells):
            return "<table></table>"
        ox, oy = tsr_result.get("offset", (0, 0))
        page_bboxes = [[c["bbox"][0] + ox, c["bbox"][1] + oy,
                        c["bbox"][2] + ox, c["bbox"][3] + oy] for c in cells]

        assigned: Dict[int, List[OcrCell]] = {}
        for t, i in zip(text_cells,
                        assign_texts_to_cells(text_cells, page_bboxes)):
            if i is not None:
                assigned.setdefault(i, []).append(t)

        texts: List[str] = []
        for i in range(len(cells)):
            inside = sort_reading_order(assigned.get(i, []))
            texts.append(html_mod.escape(
                " ".join(self._fix((t.text or "").strip())
                         for t in inside).strip()))
        return cells_to_html(cells, texts)

    @staticmethod
    def _token_path(tsr_result: Dict[str, Any],
                    text_cells: Sequence[OcrCell]) -> str:
        from .table_matcher import TableMatch

        ox, oy = tsr_result.get("offset", (0, 0))
        pred_bboxes = [[c["bbox"][0] + ox, c["bbox"][1] + oy,
                        c["bbox"][2] + ox, c["bbox"][3] + oy]
                       for c in tsr_result.get("cells", [])]
        dt_boxes = [list(t.bbox) for t in text_cells]
        use_master = tsr_result.get("type") == "master"
        if use_master:
            # master text flows through <b>-folding + deal_bb, which operate
            # on raw inline tags (reference passes unescaped rec_res,
            # ocr_table_to_html_task.py:264-270)
            texts = [(t.text or "").strip() for t in text_cells]
        else:
            texts = [html_mod.escape((t.text or "").strip())
                     for t in text_cells]
        match = TableMatch(use_master=use_master)
        return match(tsr_result["structure_tokens"], pred_bboxes,
                     dt_boxes, texts)
