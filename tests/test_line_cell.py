"""LineCell / LineCellPdf wired-table extraction tests."""

import numpy as np
import pytest


def make_table_image(rows=3, cols=3, cell=40, lw=2):
    h, w = rows * cell + lw, cols * cell + lw
    img = np.full((h, w, 3), 255, np.uint8)
    for r in range(rows + 1):
        img[r * cell:r * cell + lw, :] = 0
    for c in range(cols + 1):
        img[:, c * cell:c * cell + lw] = 0
    return img


class TestGrid:
    def test_simple_grid(self):
        from pdf_table_tpu.models.line_cell import build_grid_cells

        h = [(0, 0, 100), (20, 0, 100), (40, 0, 100)]
        v = [(0, 0, 40), (50, 0, 40), (100, 0, 40)]
        cells = build_grid_cells(h, v)
        assert len(cells) == 4
        assert cells[0].logic == (0, 0, 0, 0)
        assert cells[-1].logic == (1, 1, 1, 1)

    def test_colspan_from_missing_separator(self):
        from pdf_table_tpu.models.line_cell import build_grid_cells

        # 2x2 grid but no vertical separator in the top row -> colspan 2
        h = [(0, 0, 100), (20, 0, 100), (40, 0, 100)]
        v = [(0, 0, 40), (50, 20, 40), (100, 0, 40)]
        cells = build_grid_cells(h, v)
        logics = sorted(c.logic for c in cells)
        assert (0, 0, 0, 1) in logics     # merged top row
        assert len(cells) == 3

    def test_merge_positions(self):
        from pdf_table_tpu.models.line_cell.grid import merge_positions

        assert merge_positions([10.0, 11.0, 30.0], tol=3) == [10.5, 30.0]


class TestImageExtract:
    def test_wired_table_image(self):
        from pdf_table_tpu.models.line_cell import extract_cells_from_image

        img = make_table_image(3, 3)
        out = extract_cells_from_image(img, scale=10)
        assert len(out["cells"]) == 9
        logics = {tuple(c["logic"]) for c in out["cells"]}
        assert (0, 0, 0, 0) in logics and (2, 2, 2, 2) in logics

    def test_tsr_task_linecell(self):
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        task = OcrTableStructureTask(model="LineCell")
        out = task(make_table_image(2, 4))
        assert len(out["cells"]) == 8


class TestPdfExtract:
    def _table_pdf(self, tmp_path):
        from pdf_table_tpu.pdfio.writer import PdfWriter

        w = PdfWriter()
        page = w.add_page(300, 200)
        page.text(20, 180, "Intro line", size=10)
        page.table(20, 160, [80, 80, 80], 30,
                   [["a1", "b1", "c1"], ["a2", "b2", "c2"]])
        p = str(tmp_path / "table.pdf")
        w.save(p)
        return p

    def test_pdf_lines_and_cells(self, tmp_path):
        from pdf_table_tpu.models.line_cell import (
            extract_cells_from_pdf_page, pdf_page_lines)
        from pdf_table_tpu.pdfio.reader import PdfDocument

        p = self._table_pdf(tmp_path)
        with PdfDocument.open(p) as doc:
            page = doc.load_page(0)
            h, v = pdf_page_lines(page, scale=1.0)
            assert len(h) >= 3 and len(v) >= 4
            out = extract_cells_from_pdf_page(page, scale=1.0)
        assert len(out["cells"]) == 6

    def test_detect_table_regions(self, tmp_path):
        from pdf_table_tpu.models.line_cell.from_pdf import detect_table_regions
        from pdf_table_tpu.pdfio.reader import PdfDocument

        p = self._table_pdf(tmp_path)
        with PdfDocument.open(p) as doc:
            regions = detect_table_regions(doc.load_page(0), scale=1.0)
        assert len(regions) == 1
        assert len(regions[0]["cells"]) == 6

    def test_pipeline_digital_table_html(self, tmp_path):
        from pdf_table_tpu.pdfio.reader import PdfDocument
        from pdf_table_tpu.pipeline import OcrSystemConfig, OcrSystemTask

        p = self._table_pdf(tmp_path)
        cfg = OcrSystemConfig(use_layout=False, use_table=True, render_dpi=72)
        sys_task = OcrSystemTask(cfg)
        with PdfDocument.open(p) as doc:
            out = sys_task(pdf_page=doc.load_page(0), pdf_doc=doc)
        assert len(out.table_html) == 1
        html = out.table_html[0]
        assert "<td>a1</td>" in html and "<td>c2</td>" in html
        assert html.count("<tr>") == 2
        # intro text must stay out of the table, in a paragraph
        assert "Intro line" in out.page_html
        assert "Intro line" not in html
