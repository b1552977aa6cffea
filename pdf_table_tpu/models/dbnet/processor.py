"""DBNet pre/post processing.

Pre: resize (short-side /32 — ModelScope processor_ocr_dbnet.py:50-62 — or
Paddle limit-side — db_pp image_operators.py DetResizeForTest:212) +
normalize. Emits NHWC float32; the device program handles dtype casts.

Post: prob map -> quads. Host-exact path uses cv2 contours + minAreaRect +
an analytic unclip (for rectangles, polygon offsetting by
d = area*ratio/perimeter equals growing each side by 2d, which is what the
reference's pyclipper JT_ROUND + minAreaRect round-trip computes —
ocr_detection_utils.py:227-233). A device fast path uses
ops.connected_components for axis-aligned boxes without host sync.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .config import DbNetConfig


def _resize_short(img: np.ndarray, short_side: int) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    if h < w:
        nh = short_side
        nw = int(math.ceil(nh / h * w / 32) * 32)
    else:
        nw = short_side
        nh = int(math.ceil(nw / w * h / 32) * 32)
    return cv2.resize(img, (nw, nh))


def _resize_limit(img: np.ndarray, limit_side_len: int, limit_type: str) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    if limit_type == "max":
        ratio = float(limit_side_len) / max(h, w) if max(h, w) > limit_side_len else 1.0
    elif limit_type == "min":
        ratio = float(limit_side_len) / min(h, w) if min(h, w) < limit_side_len else 1.0
    else:
        ratio = float(limit_side_len) / max(h, w)
    nh = max(int(round(h * ratio / 32) * 32), 32)
    nw = max(int(round(w * ratio / 32) * 32), 32)
    return cv2.resize(img, (nw, nh))


class DbNetPreProcessor:
    def __init__(self, config: DbNetConfig):
        self.config = config

    def __call__(self, image: np.ndarray) -> Dict[str, Any]:
        """image: HWC uint8 RGB -> {'image': (1,H,W,3) f32, 'org_shape'}"""
        cfg = self.config
        img = image[:, :, ::-1].astype(np.float32)  # RGB->BGR like reference
        h, w = img.shape[:2]
        if cfg.resize_mode == "short":
            img = _resize_short(img, cfg.image_short_side)
        else:
            img = _resize_limit(img, cfg.limit_side_len, cfg.limit_type)
        if cfg.norm_style == "modelscope":
            img = (img - np.array([123.68, 116.78, 103.94], np.float32)) / 255.0
        else:
            img = img[:, :, ::-1] / 255.0  # back to RGB for imagenet stats
            img = (img - np.array([0.485, 0.456, 0.406], np.float32)) \
                / np.array([0.229, 0.224, 0.225], np.float32)
        return {"image": img[None].astype(np.float32),
                "org_shape": (h, w)}


def _box_score_fast(prob: np.ndarray, quad: np.ndarray) -> float:
    import cv2

    h, w = prob.shape[:2]
    box = quad.copy()
    x0 = int(np.clip(np.floor(box[:, 0].min()), 0, w - 1))
    x1 = int(np.clip(np.ceil(box[:, 0].max()), 0, w - 1))
    y0 = int(np.clip(np.floor(box[:, 1].min()), 0, h - 1))
    y1 = int(np.clip(np.ceil(box[:, 1].max()), 0, h - 1))
    mask = np.zeros((y1 - y0 + 1, x1 - x0 + 1), np.uint8)
    box[:, 0] -= x0
    box[:, 1] -= y0
    cv2.fillPoly(mask, box.reshape(1, -1, 2).astype(np.int32), 1)
    return cv2.mean(prob[y0:y1 + 1, x0:x1 + 1], mask)[0]


def _mini_box(contour) -> Tuple[np.ndarray, float]:
    import cv2

    rect = cv2.minAreaRect(contour)
    pts = sorted(cv2.boxPoints(rect), key=lambda p: p[0])
    i1, i4 = (0, 1) if pts[0][1] <= pts[1][1] else (1, 0)
    i2, i3 = (2, 3) if pts[2][1] <= pts[3][1] else (3, 2)
    box = np.array([pts[i1], pts[i2], pts[i3], pts[i4]], np.float32)
    return box, min(rect[1])


def unclip_quad(quad: np.ndarray, ratio: float) -> np.ndarray:
    """Expand a quad outward by d = area*ratio/perimeter (see module doc)."""
    a = quad.astype(np.float64)
    x, y = a[:, 0], a[:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    per = np.sum(np.linalg.norm(a - np.roll(a, -1, axis=0), axis=1))
    if per < 1e-6:
        return quad
    d = area * ratio / per
    c = a.mean(axis=0)
    out = np.empty_like(a)
    for i in range(4):
        p_prev, p, p_next = a[i - 1], a[i], a[(i + 1) % 4]
        e1 = p - p_prev
        e2 = p_next - p
        n1 = np.array([e1[1], -e1[0]])
        n2 = np.array([e2[1], -e2[0]])
        for n in (n1, n2):
            nn = np.linalg.norm(n)
            if nn > 1e-9:
                n /= nn
        # outward = away from centroid
        bis = n1 + n2
        if np.dot(bis, p - c) < 0:
            bis = -bis
        bn = np.linalg.norm(bis)
        if bn < 1e-9:
            out[i] = p
            continue
        bis /= bn
        cos_half = max(np.dot(bis, n1 if np.dot(n1, bis) > 0 else -n1), 0.2)
        out[i] = p + bis * (d / cos_half)
    return out.astype(np.float32)


class DbNetPostProcessor:
    """prob (H, W) f32 + shapes -> det quads in original-image coords.

    Returns dict with 'det_polygons' (N, 8) and 'det_scores' (N,), matching
    the reference result schema (OCRDetectionPostProcessor, db_net
    processor_ocr_dbnet.py:104-128)."""

    def __init__(self, config: DbNetConfig):
        self.config = config

    def __call__(self, prob: np.ndarray, org_shape: Tuple[int, int],
                 net_shape: Optional[Tuple[int, int]] = None) -> Dict[str, Any]:
        import cv2

        cfg = self.config
        prob = np.asarray(prob, np.float32)
        if prob.ndim == 3:
            prob = prob[0]
        H, W = prob.shape
        oh, ow = org_shape
        bitmap = (prob > cfg.thresh).astype(np.uint8)
        contours, _ = cv2.findContours(bitmap * 255, cv2.RETR_LIST,
                                       cv2.CHAIN_APPROX_SIMPLE)
        if cfg.return_polygon:
            return self._polygons_from_contours(prob, contours,
                                                (H, W), (oh, ow))
        boxes: List[List[float]] = []
        scores: List[float] = []
        for contour in contours[:cfg.max_candidates]:
            quad, sside = _mini_box(contour)
            if sside < cfg.min_size:
                continue
            score = _box_score_fast(prob, quad)
            if score < cfg.box_thresh:
                continue
            expanded = unclip_quad(quad, cfg.unclip_ratio)
            quad2, sside2 = _mini_box(expanded.reshape(-1, 1, 2).astype(np.float32))
            if sside2 < cfg.min_size + 2:
                continue
            quad2[:, 0] = np.clip(np.round(quad2[:, 0] / W * ow), 0, ow)
            quad2[:, 1] = np.clip(np.round(quad2[:, 1] / H * oh), 0, oh)
            boxes.append(quad2.reshape(-1).tolist())
            scores.append(float(score))
        return {"det_polygons": np.array(boxes, np.float32).reshape(-1, 8),
                "det_scores": np.array(scores, np.float32)}

    def _polygons_from_contours(self, prob, contours, net_hw, org_hw):
        """Polygon mode (reference polygons_from_bitmap,
        ocr_detection_utils.py:116): approxPolyDP + score filter at 0.7 +
        per-vertex normal offsetting for the unclip."""
        import cv2

        cfg = self.config
        H, W = net_hw
        oh, ow = org_hw
        polys: List[List[float]] = []
        scores: List[float] = []
        for contour in contours[:100]:
            eps = 0.01 * cv2.arcLength(contour, True)
            approx = cv2.approxPolyDP(contour, eps, True).reshape(-1, 2)
            if approx.shape[0] < 4:
                continue
            score = _box_score_fast(prob, approx.astype(np.float32))
            if score < max(cfg.box_thresh, 0.7):
                continue
            poly = self._offset_polygon(approx.astype(np.float64), 2.0)
            poly[:, 0] = np.clip(np.round(poly[:, 0] / W * ow), 0, ow)
            poly[:, 1] = np.clip(np.round(poly[:, 1] / H * oh), 0, oh)
            polys.append(poly.reshape(-1).tolist())
            scores.append(float(score))
        return {"det_polygons": polys,
                "det_scores": np.array(scores, np.float32),
                "is_polygon": True}

    @staticmethod
    def _offset_polygon(poly: np.ndarray, ratio: float) -> np.ndarray:
        """Outward offset by d = area*ratio/perimeter along vertex
        normals (pyclipper-free polygon unclip)."""
        x, y = poly[:, 0], poly[:, 1]
        area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        per = np.sum(np.linalg.norm(poly - np.roll(poly, -1, axis=0), axis=1))
        if per < 1e-6:
            return poly
        d = area * ratio / per
        c = poly.mean(axis=0)
        out = poly.copy()
        for i in range(len(poly)):
            v = poly[i] - c
            n = np.linalg.norm(v)
            if n > 1e-9:
                out[i] = poly[i] + v / n * d
        return out

    def fast_host_boxes(self, prob: np.ndarray,
                        org_shape: Tuple[int, int]) -> Dict[str, Any]:
        """Fast host path: cv2.connectedComponentsWithStats (axis-aligned
        boxes, ~20x faster than findContours+minAreaRect on the 1-core
        host). Exact rotated-quad parity stays in __call__."""
        import cv2

        cfg = self.config
        prob = np.asarray(prob, np.float32)
        if prob.ndim == 3:
            prob = prob[0]
        H, W = prob.shape
        oh, ow = org_shape
        bitmap = (prob > cfg.thresh).astype(np.uint8)
        n, labels, stats, _ = cv2.connectedComponentsWithStats(bitmap, 8)
        boxes: List[List[float]] = []
        scores: List[float] = []
        order = np.argsort(-stats[1:, cv2.CC_STAT_AREA])[:cfg.max_candidates]
        for li in order + 1:
            x, y, w, h, area = stats[li]
            if min(w, h) < cfg.min_size:
                continue
            region = prob[y:y + h, x:x + w]
            mask = labels[y:y + h, x:x + w] == li
            score = float(region[mask].mean()) if mask.any() else 0.0
            if score < cfg.box_thresh:
                continue
            d = (w * h * cfg.unclip_ratio) / max(2.0 * (w + h), 1e-6)
            x1 = np.clip((x - d) / W * ow, 0, ow)
            y1 = np.clip((y - d) / H * oh, 0, oh)
            x2 = np.clip((x + w + d) / W * ow, 0, ow)
            y2 = np.clip((y + h + d) / H * oh, 0, oh)
            boxes.append([x1, y1, x2, y1, x2, y2, x1, y2])
            scores.append(score)
        return {"det_polygons": np.array(boxes, np.float32).reshape(-1, 8),
                "det_scores": np.array(scores, np.float32)}

    def fast_device_boxes(self, prob, org_shape, max_components: int = 256):
        """Device path: connected components -> axis-aligned boxes; stays in
        XLA until final small gather. Trades rotated-quad fidelity for zero
        host contour work (SURVEY.md §7 'two-tier' design)."""
        import jax.numpy as jnp

        from ...ops import component_boxes
        from ...ops.connected_components import connected_components_scan

        cfg = self.config
        p = jnp.asarray(prob)
        if p.ndim == 3:
            p = p[0]
        H, W = p.shape
        labels = connected_components_scan(p > cfg.thresh)
        boxes, means, areas, valid = component_boxes(labels, p, max_components)
        boxes, means, areas, valid = (np.asarray(boxes), np.asarray(means),
                                      np.asarray(areas), np.asarray(valid))
        oh, ow = org_shape
        keep = valid & (means >= cfg.box_thresh) \
            & ((boxes[:, 2] - boxes[:, 0]) >= cfg.min_size) \
            & ((boxes[:, 3] - boxes[:, 1]) >= cfg.min_size)
        boxes = boxes[keep]
        # analytic unclip for axis-aligned boxes
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        d = (w * h * cfg.unclip_ratio) / np.maximum(2 * (w + h), 1e-6)
        grown = np.stack([boxes[:, 0] - d, boxes[:, 1] - d,
                          boxes[:, 2] + d, boxes[:, 3] + d], axis=1)
        grown[:, 0::2] = np.clip(grown[:, 0::2] / W * ow, 0, ow)
        grown[:, 1::2] = np.clip(grown[:, 1::2] / H * oh, 0, oh)
        quads = np.stack([grown[:, 0], grown[:, 1], grown[:, 2], grown[:, 1],
                          grown[:, 2], grown[:, 3], grown[:, 0], grown[:, 3]],
                         axis=1)
        return {"det_polygons": quads.astype(np.float32),
                "det_scores": means[keep].astype(np.float32)}
