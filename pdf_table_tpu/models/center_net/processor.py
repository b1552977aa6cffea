"""Cycle-CenterNet pre/post processing.

Pre: centered affine to 1024 + CenterNet norm (processer_centernet.py:42).
Post: host port of group_bbox_by_gbox (table_process.py:278) — snap cell
corners to shared vertices — then inverse-affine to image coords and
logical-coordinate assignment from boundary clustering (the reference
derives logical axes geometrically via TableProcessUtils).
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from ..line_cell.grid import merge_positions
from .config import CenterNetConfig


class CenterNetPreProcessor:
    MEAN = np.array([0.408, 0.447, 0.470], np.float32)
    STD = np.array([0.289, 0.274, 0.278], np.float32)

    def __init__(self, config: CenterNetConfig):
        self.config = config

    def __call__(self, image: np.ndarray) -> Dict[str, Any]:
        import cv2

        h, w = image.shape[:2]
        inp_h, inp_w = self.config.resolution
        s = max(h, w)
        scale = inp_w / s
        c = (w / 2.0, h / 2.0)
        mat = np.array([[scale, 0, inp_w / 2 - scale * c[0]],
                        [0, scale, inp_h / 2 - scale * c[1]]], np.float32)
        warped = cv2.warpAffine(image[:, :, ::-1].astype(np.float32), mat,
                                (inp_w, inp_h))
        norm = (warped / 255.0 - self.MEAN) / self.STD
        return {"image": norm[None].astype(np.float32),
                "meta": {"c": c, "s": float(s), "org_shape": (h, w),
                         "out_w": inp_w // self.config.down_ratio}}


def group_bbox_by_gbox(bboxes: np.ndarray, gboxes: np.ndarray,
                       score_thresh: float = 0.3,
                       v2c_dist: float = 2.0,
                       c2v_dist: float = 0.5) -> np.ndarray:
    """Vertex-snap (host port of reference group_bbox_by_gbox,
    table_process.py:278). bboxes (K, 9) quad+score; gboxes (MK, 11)
    vertex + 4 centers + score."""

    def point_in_quad(q, p):
        x, y = p
        s = 0
        for i in range(4):
            x1, y1 = q[2 * i], q[2 * i + 1]
            x2, y2 = q[(2 * i + 2) % 8], q[(2 * i + 3) % 8]
            cr = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
            s += 1 if cr > 0 else (-1 if cr < 0 else 0)
        return abs(s) == 4

    dets = bboxes.copy()
    snapped = np.zeros((len(dets), 4), bool)
    for g in gboxes:
        if g[10] < score_thresh:
            break
        vx, vy = g[0], g[1]
        for i in range(4):
            ccx, ccy = g[2 + 2 * i], g[3 + 2 * i]
            if np.hypot(vx - ccx, vy - ccy) < v2c_dist:
                continue
            for k in range(len(dets)):
                if dets[k, 8] < score_thresh:
                    break
                if snapped[k].all():
                    continue
                q = dets[k, :8]
                # cell size from quad extents (the reference's index-based
                # formula assumes its diagonal point ordering; extents are
                # ordering-independent)
                m = max(q[0::2].max() - q[0::2].min(),
                        q[1::2].max() - q[1::2].min())
                if point_in_quad(q, (ccx, ccy)):
                    d = [np.hypot(vx - q[2 * j], vy - q[2 * j + 1])
                         for j in range(4)]
                    j = int(np.argmin(d))
                    if d[j] < c2v_dist * m and not snapped[k, j]:
                        bboxes[k, 2 * j] = vx
                        bboxes[k, 2 * j + 1] = vy
                        snapped[k, j] = True
    return bboxes


def assign_logical_coords(cells: List[Dict[str, Any]],
                          tol: float = 8.0) -> None:
    """Cluster x/y boundaries -> row/col indices with spans (geometric
    logical assignment; reference modify_cell_info, table_common.py:1684)."""
    if not cells:
        return
    xs = merge_positions([c["bbox"][0] for c in cells]
                         + [c["bbox"][2] for c in cells], tol)
    ys = merge_positions([c["bbox"][1] for c in cells]
                         + [c["bbox"][3] for c in cells], tol)

    def idx_of(v, bounds):
        return int(np.argmin([abs(v - b) for b in bounds]))

    for c in cells:
        x1, y1, x2, y2 = c["bbox"]
        cs = idx_of(x1, xs)
        ce = max(idx_of(x2, xs) - 1, cs)
        rs = idx_of(y1, ys)
        re = max(idx_of(y2, ys) - 1, rs)
        c["logic"] = [rs, re, cs, ce]


class CenterNetPostProcessor:
    def __init__(self, config: CenterNetConfig):
        self.config = config

    def __call__(self, raw: Dict[str, Any], meta: Dict[str, Any]) -> Dict[str, Any]:
        cfg = self.config
        dets = np.asarray(raw["dets"][0], np.float32)       # (K, 8) fmap
        scores = np.asarray(raw["scores"][0], np.float32)
        gboxes = np.asarray(raw["gboxes"][0], np.float32)

        b9 = np.concatenate([dets, scores[:, None]], axis=1)
        b9 = group_bbox_by_gbox(b9, gboxes, cfg.score_thresh,
                                cfg.v2c_dist_thresh, cfg.c2v_dist_thresh)

        # fmap -> image coords (invert centered affine)
        s, out_w = meta["s"], meta["out_w"]
        scale_back = s / out_w
        cx, cy = meta["c"]
        h, w = meta["org_shape"]
        pts = b9[:, :8].reshape(-1, 4, 2) * scale_back
        pts[:, :, 0] += cx - s / 2
        pts[:, :, 1] += cy - s / 2
        pts[:, :, 0] = np.clip(pts[:, :, 0], 0, w)
        pts[:, :, 1] = np.clip(pts[:, :, 1], 0, h)

        cells = []
        for i in range(len(b9)):
            if b9[i, 8] < cfg.score_thresh:
                continue
            quad = pts[i]
            x1, y1 = quad[:, 0].min(), quad[:, 1].min()
            x2, y2 = quad[:, 0].max(), quad[:, 1].max()
            if x2 - x1 < 1 or y2 - y1 < 1:
                continue
            cells.append({"bbox": [float(x1), float(y1), float(x2), float(y2)],
                          "poly": quad.reshape(-1).tolist(),
                          "score": float(b9[i, 8])})
        assign_logical_coords(cells)
        return {"cells": cells, "type": "center_net"}
