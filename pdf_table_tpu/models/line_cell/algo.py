"""LineCell: wired-table cell extraction from a raster image.

Reference: TableCellExtract (model/pdf_table/table_cell_extract.py:43 +
model/table/line_cell/table_cell_extract_algo.py): adaptive threshold ->
morphological open with long thin kernels -> h/v line masks -> segments ->
grid cells. Host path uses cv2 (same library as the reference); a
JAX reduce-window variant backs the on-device fast path for batched pages.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from .grid import build_grid_cells


def find_table_lines(image: np.ndarray, scale: int = 15,
                     min_line_len: int = 20):
    """-> (h_lines [(y, x0, x1)], v_lines [(x, y0, y1)]) in image coords.

    (reference PdfImageProcessor.find_lines, image_processing.py:79:
    adaptive threshold + MORPH_OPEN with (size,1)/(1,size) kernels.)"""
    import cv2

    gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY) if image.ndim == 3 else image
    thr = cv2.adaptiveThreshold(np.invert(gray), 255,
                                cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                                cv2.THRESH_BINARY, 15, -2)
    h, w = thr.shape
    h_size = max(w // scale, 5)
    v_size = max(h // scale, 5)

    hk = cv2.getStructuringElement(cv2.MORPH_RECT, (h_size, 1))
    h_mask = cv2.morphologyEx(thr, cv2.MORPH_OPEN, hk)
    vk = cv2.getStructuringElement(cv2.MORPH_RECT, (1, v_size))
    v_mask = cv2.morphologyEx(thr, cv2.MORPH_OPEN, vk)

    h_lines: List[Tuple[float, float, float]] = []
    contours, _ = cv2.findContours(h_mask, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    for c in contours:
        x, y, cw, ch = cv2.boundingRect(c)
        if cw >= min_line_len:
            h_lines.append((y + ch / 2.0, float(x), float(x + cw)))
    v_lines: List[Tuple[float, float, float]] = []
    contours, _ = cv2.findContours(v_mask, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    for c in contours:
        x, y, cw, ch = cv2.boundingRect(c)
        if ch >= min_line_len:
            v_lines.append((x + cw / 2.0, float(y), float(y + ch)))
    return h_lines, v_lines


def extract_cells_from_image(image: np.ndarray, scale: int = 15,
                             tol: float = 5.0) -> Dict[str, Any]:
    """Image crop of a wired table -> TSR result schema."""
    h_lines, v_lines = find_table_lines(image, scale=scale)
    cells = build_grid_cells(h_lines, v_lines, tol=tol)
    return {"cells": [c.to_dict() for c in cells], "type": "line_cell",
            "n_h_lines": len(h_lines), "n_v_lines": len(v_lines)}
