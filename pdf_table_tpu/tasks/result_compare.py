"""HTML table result comparison / classification.

Reference: TableResultCompare (model/pdf_table/table_result_compare.py:28)
— classifies two extraction results into the HtmlTableCompareType buckets
(entity/enum_entity.py:35): exact same, same-after-width-strip, text-order
diffs, span diffs, missing-word diffs.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

from ..entity.enums import HtmlTableCompareType


def _cells_of(html: str) -> List[Tuple[str, int, int]]:
    """[(text, rowspan, colspan)] in document order."""
    from lxml import html as lxml_html

    try:
        doc = lxml_html.fromstring(html)
    except Exception:
        return []
    out = []
    for td in doc.xpath(".//td|.//th"):
        text = "".join(td.itertext()).strip()
        out.append((text, int(td.get("rowspan", 1) or 1),
                    int(td.get("colspan", 1) or 1)))
    return out


def _strip_width(html: str) -> str:
    return re.sub(r'\s*(?:width|style)="[^"]*"', "", html)


def _norm(html: str) -> str:
    return re.sub(r">\s+<", "><", html.strip())


class TableResultCompare:
    def __call__(self, pred_html: str, label_html: str) -> Dict[str, Any]:
        result: Dict[str, Any] = {"type": HtmlTableCompareType.DIFF}
        if _norm(pred_html) == _norm(label_html):
            result["type"] = HtmlTableCompareType.SAME
            return result
        if _norm(_strip_width(pred_html)) == _norm(_strip_width(label_html)):
            result["type"] = HtmlTableCompareType.REMOVE_WIDTH_SAME
            return result

        pc = _cells_of(pred_html)
        lc = _cells_of(label_html)
        p_texts = [c[0] for c in pc]
        l_texts = [c[0] for c in lc]
        if p_texts == l_texts:
            # same text, different spans
            p_spans = [(c[1], c[2]) for c in pc]
            l_spans = [(c[1], c[2]) for c in lc]
            row_diff = any(a[0] != b[0] for a, b in zip(p_spans, l_spans))
            col_diff = any(a[1] != b[1] for a, b in zip(p_spans, l_spans))
            if row_diff and col_diff:
                result["type"] = HtmlTableCompareType.DIFF_CELL_ROW_COL_SPAN
            elif row_diff:
                result["type"] = HtmlTableCompareType.DIFF_CELL_ROW_SPAN
            elif col_diff:
                result["type"] = HtmlTableCompareType.DIFF_CELL_COL_SPAN
            else:
                result["type"] = HtmlTableCompareType.DIFF_CELL_SPAN_SAME
            return result
        if sorted(p_texts) == sorted(l_texts):
            result["type"] = HtmlTableCompareType.DIFF_TEXT_ORDER
            return result
        p_joined = " ".join(p_texts)
        l_joined = " ".join(l_texts)
        p_words = set(p_joined.split())
        l_words = set(l_joined.split())
        if p_words < l_words:
            result["type"] = HtmlTableCompareType.DIFF_TEXT_PREDICT_LESS_WORDS
        elif l_words < p_words:
            result["type"] = HtmlTableCompareType.DIFF_TEXT_LABEL_LESS_WORDS
        else:
            result["type"] = HtmlTableCompareType.DIFF_TEXT_INCONSISTENT
        result["pred_cells"] = len(pc)
        result["label_cells"] = len(lc)
        return result
