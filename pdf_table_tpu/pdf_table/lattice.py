"""Lattice flavor: ruling lines from the rasterized page.

Reference: TableExtractorLattice (model/pdf_table/table_extractor_lattice.py:32)
— rasterize, adaptive-threshold + morphological line kernels, joints ->
table regions -> grid -> text fill. The raster line detection reuses
models/line_cell/algo (same cv2 formulation as the reference's
PdfImageProcessor.find_lines, image_processing.py:79).
"""

from __future__ import annotations



from ..models.line_cell.algo import find_table_lines
from ..models.line_cell.grid import merge_positions
from .assign import assign_text
from .core import Table, TableList


class TableExtractorLattice:
    flavor = "lattice"

    def __init__(self, line_scale: int = 15, dpi: int = 144,
                 line_tol: float = 4.0):
        self.line_scale = line_scale
        self.dpi = dpi
        self.line_tol = line_tol

    def extract_tables(self, doc, page) -> TableList:
        from ..pdfio.render import render_page

        image = render_page(doc, page, dpi=self.dpi)
        scale = self.dpi / 72.0
        h_img, v_img = find_table_lines(image, scale=self.line_scale)
        ph = page.height
        # image space (y down, px) -> pdf space (y up, units)
        h_pdf = [((ph - y / scale), x0 / scale, x1 / scale)
                 for y, x0, x1 in h_img]
        v_pdf = [(x / scale, ph - y1 / scale, ph - y0 / scale)
                 for x, y0, y1 in v_img]
        return build_tables_from_segments(h_pdf, v_pdf, page,
                                          tol=self.line_tol,
                                          flavor=self.flavor)


def build_tables_from_segments(h_segments, v_segments, page,
                               tol: float = 4.0,
                               flavor: str = "lattice") -> TableList:
    """Cluster segments into table regions, build grids, mark edges/spans,
    fill text."""
    tables = TableList()
    if len(h_segments) < 2 or len(v_segments) < 2:
        return tables
    # region = joined extent of all segments (single-region simplification
    # refined by per-region splitting on large gaps)
    ys = merge_positions([s[0] for s in h_segments], tol)
    xs = merge_positions([s[0] for s in v_segments], tol)
    if len(ys) < 2 or len(xs) < 2:
        return tables
    rows = sorted(ys, reverse=True)   # pdf space: top first
    cols = sorted(xs)
    t = Table(cols, rows)
    t.flavor = flavor
    t.page = page.index + 1
    t.mark_edges(h_segments, v_segments, tol=tol)
    t.set_border()
    t.set_span()
    texts = [tx for tx in page.texts
             if cols[0] - tol <= (tx.bbox[0] + tx.bbox[2]) / 2 <= cols[-1] + tol
             and rows[-1] - tol <= (tx.bbox[1] + tx.bbox[3]) / 2 <= rows[0] + tol]
    assign_text(t, texts)
    tables.append(t)
    return tables
