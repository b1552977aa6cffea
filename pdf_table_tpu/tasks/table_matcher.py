"""Token-path table assembly: match OCR boxes to predicted td bboxes and
weave text into the structure-token stream.

Reference: TableMatch (model/ocr_pdf/table/matcher.py:58) — per OCR box,
choose the td bbox minimizing (1-IoU, L1 center distance); then walk the
token list appending matched text at each '</td>'. The '<td></td>' token
expands to '<td>text</td>' (get_pred_html:102-138). Used by SLANet, and by
TableMaster/MtlTabNet via the master variant.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def _to_xyxy(box) -> np.ndarray:
    b = np.asarray(box, np.float32).reshape(-1)
    if b.size >= 8:
        return np.array([b[0::2].min(), b[1::2].min(),
                         b[0::2].max(), b[1::2].max()], np.float32)
    return b[:4]


def compute_iou(a, b) -> float:
    a, b = _to_xyxy(a), _to_xyxy(b)
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return float(inter / ua) if ua > 0 else 0.0


def l1_distance(a, b) -> float:
    a, b = _to_xyxy(a), _to_xyxy(b)
    return float(np.abs(a - b).sum())


class TableMatch:
    def __init__(self, filter_ocr_result: bool = False,
                 use_master: bool = False):
        self.filter_ocr_result = filter_ocr_result
        self.use_master = use_master

    def match_result(self, dt_boxes: Sequence, pred_bboxes: Sequence
                     ) -> Dict[int, List[int]]:
        matched: Dict[int, List[int]] = {}
        for i, gt in enumerate(dt_boxes):
            best_j, best_key = None, None
            for j, pb in enumerate(pred_bboxes):
                key = (1.0 - compute_iou(gt, pb), l1_distance(gt, pb))
                if best_key is None or key < best_key:
                    best_key, best_j = key, j
            if best_j is not None:
                matched.setdefault(best_j, []).append(i)
        return matched

    def get_pred_html(self, tokens: Sequence[str],
                      matched: Dict[int, List[int]],
                      texts: Sequence[str]) -> str:
        out: List[str] = []
        td_index = 0
        for tag in tokens:
            if "</td>" not in tag:
                out.append(tag)
                continue
            if tag == "<td></td>":
                out.append("<td>")
            cell_texts = []
            for k in matched.get(td_index, []):
                content = texts[k]
                if len(matched[td_index]) > 1:
                    content = content.strip()
                    if not content:
                        continue
                cell_texts.append(content)
            out.append(" ".join(cell_texts) if len(cell_texts) > 1
                       else "".join(cell_texts))
            out.append("</td>" if tag == "<td></td>" else tag)
            td_index += 1
        return "".join(out)

    def __call__(self, structure_tokens: Sequence[str],
                 pred_bboxes: Sequence, dt_boxes: Sequence,
                 texts: Sequence[str]) -> str:
        if self.filter_ocr_result and len(pred_bboxes):
            tops = min(_to_xyxy(b)[1] for b in pred_bboxes)
            keep = [i for i, b in enumerate(dt_boxes)
                    if _to_xyxy(b)[3] >= tops]
            dt_boxes = [dt_boxes[i] for i in keep]
            texts = [texts[i] for i in keep]
        matched = self.match_result(dt_boxes, pred_bboxes)
        html = self.get_pred_html(structure_tokens, matched, texts)
        if not html.startswith("<table"):
            html = "<table>" + html + "</table>"
        return html
