"""Pdf-flavor heuristic depth tests (VERDICT r2 #4).

Reference behaviors: text_box_split_to_cell (table_common.py:1029),
find_top1_mach_box (table_extractor_pdf.py:1182),
merge_row_cell/merge_column_cell span inference (:769,:841).
"""

import numpy as np
import pytest


class FakeText:
    def __init__(self, text, bbox, adv=None, origin=None):
        self.text = text
        self.bbox = bbox
        self.adv = adv
        self.origin = origin or (bbox[0], bbox[1])


class TestSplit:
    def test_straddling_text_splits_at_border(self):
        from pdf_table_tpu.pdf_table.assign import split_texts_to_cells

        # two cells side by side: [0,50] and [50,100], row y [0,20]
        cells = [(0, 0, 50, 20), (50, 0, 100, 20)]
        # "ABCD" 10pt chars from x=30: A[30-40] B[40-50] C[50-60] D[60-70]
        t = FakeText("ABCD", (30, 5, 70, 15), adv=[10.0] * 4,
                     origin=(30, 5))
        items = split_texts_to_cells([t], cells)
        assert [i.text for i in items] == ["AB", "CD"]
        assert items[0].bbox[0] == 30 and items[0].bbox[2] == 50
        assert items[1].bbox[0] == 50 and items[1].bbox[2] == 70

    def test_contained_text_untouched(self):
        from pdf_table_tpu.pdf_table.assign import split_texts_to_cells

        cells = [(0, 0, 50, 20), (50, 0, 100, 20)]
        t = FakeText("in", (5, 5, 20, 15), adv=[7.0, 8.0])
        items = split_texts_to_cells([t], cells)
        assert len(items) == 1 and items[0].text == "in"

    def test_no_advances_falls_back_whole(self):
        from pdf_table_tpu.pdf_table.assign import split_texts_to_cells

        cells = [(0, 0, 50, 20), (50, 0, 100, 20)]
        t = FakeText("ABCD", (30, 5, 70, 15), adv=None)
        items = split_texts_to_cells([t], cells)
        assert len(items) == 1


class TestTop1Chain:
    def test_containment_wins(self):
        from pdf_table_tpu.pdf_table.assign import find_top1_match_box

        cells = [(0, 0, 50, 20), (50, 0, 100, 20)]
        assert find_top1_match_box((55, 2, 95, 18), cells) == 1

    def test_iou_fallback(self):
        from pdf_table_tpu.pdf_table.assign import find_top1_match_box

        cells = [(0, 0, 50, 20), (50, 0, 100, 20)]
        # mostly over cell 1 but pokes into cell 0 -> not contained
        assert find_top1_match_box((45, 2, 95, 18), cells) == 1

    def test_distance_fallback_outside(self):
        from pdf_table_tpu.pdf_table.assign import find_top1_match_box

        cells = [(0, 0, 50, 20), (50, 0, 100, 20)]
        # fully outside the grid, nearer the right cell
        assert find_top1_match_box((90, 30, 110, 40), cells) == 1


class TestLogicalCells:
    def _spanned_table(self):
        from pdf_table_tpu.pdf_table.core import Table

        # 2x2 grid; right column merged vertically (missing inner h-sep)
        t = Table([0, 50, 100], [40, 20, 0])
        t.set_all_edges()
        t.cells[0][1].bottom = False
        t.cells[1][1].top = False
        t.set_span()
        return t

    def test_logical_regions_and_bbox(self):
        t = self._spanned_table()
        regions = t.logical_cells()
        assert len(regions) == 3
        merged = [r for r in regions if r[2] > 1][0]
        assert (merged[0], merged[1], merged[2], merged[3]) == (0, 1, 2, 1)
        assert merged[4] == (50, 0, 100, 40)

    def test_html_spans(self):
        t = self._spanned_table()
        html = t.to_html()
        assert 'rowspan="2"' in html
        assert html.count("<td") == 3

    def test_text_in_swallowed_subcell_lands_at_anchor(self):
        from pdf_table_tpu.pdf_table.assign import assign_text

        t = self._spanned_table()
        # text sits in the BOTTOM half of the merged region
        assign_text(t, [FakeText("X", (60, 5, 80, 15))])
        assert t.cells[0][1].text == "X"
        assert "X" in t.to_html()

    def test_multiline_cell_reading_order(self):
        from pdf_table_tpu.pdf_table.assign import assign_text

        t = self._spanned_table()
        assign_text(t, [FakeText("lower", (55, 4, 95, 14)),
                        FakeText("upper", (55, 24, 95, 34))])
        assert t.cells[0][1].text == "upper\nlower"


class TestEndToEnd:
    def test_pdf_flavor_straddle_and_missing_sep(self, tmp_path):
        """VERDICT done-criterion: straddling text + missing inner
        separator reproduce reference placement and spans."""
        from pdf_table_tpu.pdfio import writer
        from pdf_table_tpu import read_pdf

        doc = writer.PdfWriter()
        page = doc.add_page(300, 200)
        # 2x2 table at x 40..240, y 100..160, NO vertical separator in the
        # bottom row (bottom row = one spanned cell)
        x0, x1, x2 = 40.0, 140.0, 240.0
        yt, ym, yb = 160.0, 130.0, 100.0
        for y in (yt, ym, yb):
            page.line(x0, y, x2, y)
        page.line(x0, yb, x0, yt)
        page.line(x2, yb, x2, yt)
        page.line(x1, ym, x1, yt)          # only in the top row
        page.text(60, 140, "A", size=10)
        page.text(160, 140, "B", size=10)
        # straddling line across the missing separator region
        page.text(100, 110, "wide text", size=10)
        p = tmp_path / "span.pdf"
        doc.save(str(p))

        tables = read_pdf(str(p), flavor="pdf")
        assert len(tables) >= 1
        html = tables[0].to_html()
        assert 'colspan="2"' in html
        assert "wide text" in html
        data = tables[0].data
        assert data[0][0] == "A" and data[0][1] == "B"
