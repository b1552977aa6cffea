"""Stream flavor: whitespace/text-edge clustering for borderless tables.

Reference: TableExtractorStream (model/pdf_table/table_extractor_stream.py:26)
with TextEdges (table_core.py:85): text runs group into rows by y overlap;
column boundaries come from aligned left/right/middle text edges; the grid
is cut at gaps between column groups.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


from .assign import assign_text
from .core import Table, TableList


def group_rows(texts: Sequence, row_tol: float = 2.0) -> List[List]:
    """Sort by top edge descending (pdf space), cluster into rows."""
    items = sorted([t for t in texts if t.text.strip()],
                   key=lambda t: -t.bbox[3])
    rows: List[List] = []
    for t in items:
        placed = False
        for row in rows:
            ref = row[-1]
            if abs(t.bbox[3] - ref.bbox[3]) <= row_tol \
                    or (min(t.bbox[3], ref.bbox[3])
                        - max(t.bbox[1], ref.bbox[1])) > 0:
                row.append(t)
                placed = True
                break
        if not placed:
            rows.append([t])
    for row in rows:
        row.sort(key=lambda t: t.bbox[0])
    return rows


def merge_columns(intervals: List[Tuple[float, float]],
                  col_tol: float = 10.0) -> List[Tuple[float, float]]:
    """Merge overlapping/near x-intervals into column extents."""
    merged: List[List[float]] = []
    for lo, hi in sorted(intervals):
        if merged and lo <= merged[-1][1] + col_tol:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return [(a, b) for a, b in merged]


class TableExtractorStream:
    flavor = "stream"

    def __init__(self, row_tol: float = 2.0, col_tol: float = 10.0,
                 min_rows: int = 2):
        self.row_tol = row_tol
        self.col_tol = col_tol
        self.min_rows = min_rows

    def extract_tables(self, doc, page) -> TableList:
        tables = TableList()
        texts = [t for t in page.texts if t.text.strip()]
        if not texts:
            return tables
        rows = group_rows(texts, self.row_tol)
        if len(rows) < self.min_rows:
            return tables
        # candidate table rows: rows with >= 2 separated runs
        table_rows = [r for r in rows if len(r) >= 2]
        if len(table_rows) < self.min_rows:
            return tables
        intervals = [(t.bbox[0], t.bbox[2]) for r in table_rows for t in r]
        cols_ext = merge_columns(intervals, self.col_tol)
        if len(cols_ext) < 2:
            return tables
        # column boundaries: midpoints between extents (+outer edges)
        bounds = [cols_ext[0][0]]
        for (a0, a1), (b0, b1) in zip(cols_ext, cols_ext[1:]):
            bounds.append((a1 + b0) / 2.0)
        bounds.append(cols_ext[-1][1])
        # row boundaries from used rows
        used = table_rows
        row_bounds = [max(t.bbox[3] for t in used[0])]
        for r0, r1 in zip(used, used[1:]):
            top_next = max(t.bbox[3] for t in r1)
            bot_prev = min(t.bbox[1] for t in r0)
            row_bounds.append((bot_prev + top_next) / 2.0)
        row_bounds.append(min(t.bbox[1] for t in used[-1]))

        t = Table(bounds, row_bounds)
        t.flavor = self.flavor
        t.page = page.index + 1
        t.set_all_edges()
        flat = [t2 for r in used for t2 in r]
        assign_text(t, flat)
        tables.append(t)
        return tables
