"""Pdf flavor: enhanced lattice from vector lines with cell merging and
HTML output (reference TableExtractorPdf, table_extractor_pdf.py:54 —
_generate_table_bbox:127, generate_table_cell:564, merge_row_cell:769,
merge_column_cell:841, cell_to_html:1214).

Uses the native pdfio vector segments (no rasterization), the shared
separator-grid builder for span inference, and pdf-space text matching.
"""

from __future__ import annotations


from ..models.line_cell.from_pdf import pdf_page_lines
from ..models.line_cell.grid import build_grid_cells
from .assign import assign_text
from .core import Table, TableList


class TableExtractorPdf:
    flavor = "pdf"

    def __init__(self, line_tol: float = 3.0, min_cells: int = 2):
        self.line_tol = line_tol
        self.min_cells = min_cells

    def extract_tables(self, doc, page) -> TableList:
        tables = TableList()
        # image-space lines at scale 1 with y-down; convert back to pdf space
        h_img, v_img = pdf_page_lines(page, scale=1.0)
        ph = page.height
        grid_cells = build_grid_cells(h_img, v_img, tol=self.line_tol)
        if len(grid_cells) < self.min_cells:
            return tables
        rows_i = sorted({c.logic[0] for c in grid_cells} |
                        {c.logic[1] for c in grid_cells})
        # boundaries from cell bboxes (image space y-down)
        ys = sorted({c.bbox[1] for c in grid_cells} |
                    {c.bbox[3] for c in grid_cells})
        xs = sorted({c.bbox[0] for c in grid_cells} |
                    {c.bbox[2] for c in grid_cells})
        # to pdf space: y_pdf = ph - y_img; rows top-first
        rows_pdf = sorted([ph - y for y in ys], reverse=True)
        cols_pdf = xs
        t = Table(cols_pdf, rows_pdf)
        t.flavor = self.flavor
        t.page = page.index + 1
        t.set_all_edges()
        # clear inner borders for merged cells -> spans
        for gc in grid_cells:
            rs, re, cs, ce = gc.logic
            for ri in range(rs, re + 1):
                for ci in range(cs, ce + 1):
                    if ri < re:
                        t.cells[ri][ci].bottom = False
                        if ri + 1 <= re:
                            t.cells[ri + 1][ci].top = False
                    if ci < ce:
                        t.cells[ri][ci].right = False
                        if ci + 1 <= ce:
                            t.cells[ri][ci + 1].left = False
        t.set_span()
        x1, x2 = cols_pdf[0], cols_pdf[-1]
        y1, y2 = rows_pdf[-1], rows_pdf[0]
        texts = [tx for tx in page.texts
                 if x1 - 2 <= (tx.bbox[0] + tx.bbox[2]) / 2 <= x2 + 2
                 and y1 - 2 <= (tx.bbox[1] + tx.bbox[3]) / 2 <= y2 + 2]
        assign_text(t, texts)
        tables.append(t)
        return tables
