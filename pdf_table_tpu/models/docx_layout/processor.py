"""DocXLayout pre/post processing.

Pre: centered affine warp to 768 + CenterNet normalization (reference
image_processing_docxlayout.py). Post: 4-point decode on the 11-class
heatmap (ctdet_4ps_decode, processor_utils.py:68) + polygon NMS (pnms:121),
emitting layout OcrCells; full/sub column detections from hm_sub are
exposed separately.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from ...entity.enums import HtmlContentType
from ...entity.ocr_cell import OcrCell
from .config import DocXLayoutConfig


class DocXLayoutPreProcessor:
    MEAN = np.array([0.408, 0.447, 0.470], np.float32)
    STD = np.array([0.289, 0.274, 0.278], np.float32)

    def __init__(self, config: DocXLayoutConfig):
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
                         "out_w": inp_w // self.config.down_ratio,
                         "out_h": inp_h // self.config.down_ratio}}


def poly_iou(a: np.ndarray, b: np.ndarray) -> float:
    """Axis-aligned IoU of quad hulls (pnms uses shapely polygons; bbox IoU
    is the in-tree approximation for the thin-poly layout case)."""
    ax1, ay1 = a[0::2].min(), a[1::2].min()
    ax2, ay2 = a[0::2].max(), a[1::2].max()
    bx1, by1 = b[0::2].min(), b[1::2].min()
    bx2, by2 = b[0::2].max(), b[1::2].max()
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / ua if ua > 0 else 0.0


def pnms(dets: np.ndarray, thresh: float = 0.3) -> List[int]:
    """Polygon NMS keep-indices (reference pnms, processor_utils.py:121)."""
    if len(dets) == 0:
        return []
    scores = dets[:, 8]
    order = np.argsort(-scores)
    keep: List[int] = []
    suppressed = np.zeros(len(dets), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        for j in order:
            if j == i or suppressed[j]:
                continue
            if poly_iou(dets[i, :8], dets[j, :8]) >= thresh:
                suppressed[j] = True
    return keep


class DocXLayoutPostProcessor:
    def __init__(self, config: DocXLayoutConfig):
        self.config = config

    def __call__(self, raw: Dict[str, Any], meta: Dict[str, Any]) -> Dict[str, Any]:
        from ...ops.centernet import decode_boxes_4ps

        cfg = self.config
        import jax
        import jax.numpy as jnp

        hm = jax.nn.sigmoid(jnp.asarray(raw["hm"]))
        dets, scores, clses, centers, _ = decode_boxes_4ps(
            hm, raw["wh"], raw["reg"], cfg.top_k)
        dets = np.asarray(dets[0])
        scores = np.asarray(scores[0])
        clses = np.asarray(clses[0])

        # fmap -> original image coords (invert centered affine)
        s = meta["s"]
        out_w = meta["out_w"]
        scale_back = s / out_w
        cx, cy = meta["c"]
        pts = dets.reshape(-1, 4, 2) * scale_back
        pts[:, :, 0] += cx - s / 2
        pts[:, :, 1] += cy - s / 2
        h, w = meta["org_shape"]
        pts[:, :, 0] = np.clip(pts[:, :, 0], 0, w)
        pts[:, :, 1] = np.clip(pts[:, :, 1], 0, h)

        keep_mask = scores >= cfg.scores_thresh
        dets9 = np.concatenate([pts.reshape(-1, 8), scores[:, None]], axis=1)
        idx = [i for i in pnms(dets9[keep_mask]) ]
        valid = np.where(keep_mask)[0][idx] if idx else np.array([], int)

        results = []
        for i in valid:
            quad = pts[i]
            label = cfg.id2label.get(int(clses[i]), str(int(clses[i])))
            results.append({"bbox": [float(quad[:, 0].min()),
                                     float(quad[:, 1].min()),
                                     float(quad[:, 0].max()),
                                     float(quad[:, 1].max())],
                            "poly": quad.reshape(-1).tolist(),
                            "label": label, "score": float(scores[i]),
                            "category_id": int(clses[i])})

        # subfield (full/sub column) detections from hm_sub share wh/reg
        # (reference dets_sub path, image_processing_docxlayout.py:232-244)
        subfields = []
        if "hm_sub" in raw:
            shm = jax.nn.sigmoid(jnp.asarray(raw["hm_sub"]))
            sdets, sscores, sclses, _, _ = decode_boxes_4ps(
                shm, raw["wh"], raw["reg"], min(cfg.top_k, 20))
            sdets = np.asarray(sdets[0])
            sscores = np.asarray(sscores[0])
            sclses = np.asarray(sclses[0])
            spts = sdets.reshape(-1, 4, 2) * scale_back
            spts[:, :, 0] += cx - s / 2
            spts[:, :, 1] += cy - s / 2
            sub_labels = {0: "full_column", 1: "sub_column"}
            for i in np.where(sscores >= cfg.scores_thresh)[0]:
                q = spts[i]
                subfields.append({
                    "bbox": [float(np.clip(q[:, 0].min(), 0, w)),
                             float(np.clip(q[:, 1].min(), 0, h)),
                             float(np.clip(q[:, 0].max(), 0, w)),
                             float(np.clip(q[:, 1].max(), 0, h))],
                    "label": sub_labels.get(int(sclses[i]), "sub"),
                    "score": float(sscores[i])})
        return {"bboxs": results, "subfield_dets": subfields}

    def to_layout_cells(self, result: Dict[str, Any]) -> List[OcrCell]:
        cells = []
        for r in result["bboxs"]:
            cell = OcrCell.from_bbox(r["bbox"], text=r["label"],
                                     score=r["score"])
            cell.cell_type = (HtmlContentType.TABLE if r["label"] == "table"
                              else HtmlContentType.TXT)
            cell.label = r["label"]
            cells.append(cell)
        return cells
