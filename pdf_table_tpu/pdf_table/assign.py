"""Text assignment into table cells (shared by all flavors).

Reference: Table text filling inside TableExtractorLattice/Stream/Pdf
(_assign text via cell containment of word centers).
"""

from __future__ import annotations

from typing import Sequence

from .core import Table


def assign_text(table: Table, texts: Sequence, tol: float = 2.0) -> Table:
    """texts: pdfio.PdfText-like objects with .bbox (pdf space) and .text.
    Word centers route to containing cells; reading order preserved by
    (top-down, left-right) sort."""
    items = sorted(texts, key=lambda t: (-round(t.bbox[3], 1), t.bbox[0]))
    for t in items:
        x = (t.bbox[0] + t.bbox[2]) / 2.0
        y = (t.bbox[1] + t.bbox[3]) / 2.0
        placed = False
        for row in table.cells:
            if not (row[0].y1 - tol <= y <= row[0].y2 + tol):
                continue
            for c in row:
                if c.x1 - tol <= x <= c.x2 + tol:
                    sep = " " if c.text and not c.text.endswith(" ") else ""
                    c.text = sep + t.text
                    placed = True
                    break
            if placed:
                break
    table.compute_stats()
    return table
