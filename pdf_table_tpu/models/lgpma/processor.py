"""LGPMA pre/post processing.

Pre: keep-ratio resize to max_side, /32 pad, imagenet norm (mmdet test
pipeline in the reference's lgpma_config.py). Post (post_lgpma.py
behavior): score-filter + NMS the refined cell boxes, align boxes using
mask projections (approximated by bbox snapping to clustered boundaries),
then logical-coordinate assignment — same geometric assignment as the
reference's aligned-bbox soft matching stage.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from ..center_net.processor import assign_logical_coords
from .config import LgpmaConfig


class LgpmaPreProcessor:
    def __init__(self, config: LgpmaConfig):
        self.config = config

    def __call__(self, image: np.ndarray) -> Dict[str, Any]:
        import cv2

        h, w = image.shape[:2]
        scale = min(self.config.max_side / max(h, w), 1.0) \
            if max(h, w) > self.config.max_side else 1.0
        nh = max(int(round(h * scale / 32) * 32), 32)
        nw = max(int(round(w * scale / 32) * 32), 32)
        resized = cv2.resize(image, (nw, nh)).astype(np.float32)
        norm = (resized / 255.0 - np.array([0.485, 0.456, 0.406], np.float32)) \
            / np.array([0.229, 0.224, 0.225], np.float32)
        return {"image": norm[None].astype(np.float32),
                "meta": {"org_shape": (h, w), "scale": (nh / h, nw / w)}}


class LgpmaPostProcessor:
    def __init__(self, config: LgpmaConfig):
        self.config = config

    def __call__(self, raw: Dict[str, Any], meta: Dict[str, Any]) -> Dict[str, Any]:
        from ...ops.nms import hard_nms
        from ..line_cell.grid import merge_positions

        cfg = self.config
        boxes = np.asarray(raw["boxes"][0], np.float32)
        scores = np.asarray(raw["scores"][0], np.float32)
        sy, sx = meta["scale"]
        keep = scores >= cfg.score_thresh
        if not keep.any():
            return {"cells": [], "type": "lgpma"}
        kb, ks, _ = hard_nms(boxes[keep], scores[keep],
                             iou_threshold=cfg.nms_thresh)
        kb = kb.copy()
        kb[:, 0::2] /= sx
        kb[:, 1::2] /= sy
        h, w = meta["org_shape"]
        kb[:, 0::2] = np.clip(kb[:, 0::2], 0, w)
        kb[:, 1::2] = np.clip(kb[:, 1::2], 0, h)

        # aligned-bbox refinement: snap edges to clustered boundaries
        xs = merge_positions(list(kb[:, 0]) + list(kb[:, 2]), tol=8.0)
        ys = merge_positions(list(kb[:, 1]) + list(kb[:, 3]), tol=8.0)

        def snap(v, bounds):
            return bounds[int(np.argmin([abs(v - b) for b in bounds]))]

        cells: List[Dict[str, Any]] = []
        for b, s in zip(kb, ks):
            x1, y1 = snap(b[0], xs), snap(b[1], ys)
            x2, y2 = snap(b[2], xs), snap(b[3], ys)
            if x2 - x1 < 1 or y2 - y1 < 1:
                continue
            cells.append({"bbox": [float(x1), float(y1),
                                   float(x2), float(y2)],
                          "score": float(s)})
        assign_logical_coords(cells)
        return {"cells": cells, "type": "lgpma"}
