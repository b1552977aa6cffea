"""Annotated debug overlays (reference debug renders,
ocr_system_task.py:584-718): detected text boxes, layout regions, and
table-structure cells drawn onto the page raster."""

from __future__ import annotations


import numpy as np

COLORS = {"text": (60, 170, 60), "layout": (220, 120, 40),
          "table": (40, 90, 220), "cell": (200, 40, 40)}


def render_debug_overlay(image: np.ndarray, text_cells=(),
                         layout_cells=(), table_results=()) -> np.ndarray:
    import cv2

    img = np.ascontiguousarray(image.copy())

    for c in text_cells:
        if getattr(c, "poly", None) is not None:
            pts = np.asarray(c.poly, np.int32).reshape(-1, 1, 2)
            cv2.polylines(img, [pts], True, COLORS["text"], 1)
        else:
            x1, y1, x2, y2 = [int(v) for v in c.bbox]
            cv2.rectangle(img, (x1, y1), (x2, y2), COLORS["text"], 1)

    for c in layout_cells:
        x1, y1, x2, y2 = [int(v) for v in c.bbox]
        label = getattr(c, "label", None) or (c.text or "")
        color = COLORS["table"] if label == "table" else COLORS["layout"]
        cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
        if label:
            cv2.putText(img, f"{label} {c.score:.2f}", (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.45, color, 1)

    for tb, result in table_results:
        ox, oy = result.get("offset", (0, 0))
        for cell in result.get("cells", []):
            x1, y1, x2, y2 = [int(v) for v in cell["bbox"]]
            cv2.rectangle(img, (x1 + int(ox), y1 + int(oy)),
                          (x2 + int(ox), y2 + int(oy)), COLORS["cell"], 1)
            logic = cell.get("logic")
            if logic:
                cv2.putText(img, f"{logic[0]},{logic[2]}",
                            (x1 + int(ox) + 2, y1 + int(oy) + 12),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.35, COLORS["cell"], 1)
    return img
