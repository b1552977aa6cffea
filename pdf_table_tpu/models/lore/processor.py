"""LORE pre/post processing.

Pre: corner-anchored (upper_left) or centered affine warp to the static
resolution + CenterNet normalization (reference TableLorePreProcessor,
processer_lore.py:34-131: mean [.408,.447,.470], std [.289,.274,.278]).

Post: map K-slot device outputs back to image coords (inverse affine on
stride-4 fmap coords; reference transform_preds,
lineless_table_process.py:471), round logical axes
(process_logic_output:662), filter by validity mask, emit the TSR result
schema {"cells": [{"bbox","poly","logic","score"}]}.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from .config import LoreConfig


class LorePreProcessor:
    MEAN = np.array([0.408, 0.447, 0.470], np.float32)
    STD = np.array([0.289, 0.274, 0.278], np.float32)

    def __init__(self, config: LoreConfig):
        self.config = config

    def __call__(self, image: np.ndarray) -> Dict[str, Any]:
        import cv2

        cfg = self.config
        h, w = image.shape[:2]
        inp_h, inp_w = cfg.resolution
        s = max(h, w) * 1.0
        if cfg.upper_left:
            # map [0, s] -> [0, inp]; corner-anchored
            scale = inp_w / s
            mat = np.array([[scale, 0, 0], [0, scale, 0]], np.float32)
            c = np.array([0.0, 0.0], np.float32)
        else:
            c = np.array([w / 2.0, h / 2.0], np.float32)
            scale = inp_w / s
            mat = np.array([[scale, 0, inp_w / 2 - scale * c[0]],
                            [0, scale, inp_h / 2 - scale * c[1]]], np.float32)
        warped = cv2.warpAffine(image[:, :, ::-1].astype(np.float32), mat,
                                (inp_w, inp_h), flags=cv2.INTER_LINEAR)
        norm = (warped / 255.0 - self.MEAN) / self.STD
        return {"image": norm[None].astype(np.float32),
                "meta": {"c": c, "s": s, "org_shape": (h, w),
                         "out_h": inp_h // cfg.down_ratio,
                         "out_w": inp_w // cfg.down_ratio}}

    def warp_u8(self, image: np.ndarray) -> Dict[str, Any]:
        """Warp only, uint8 RGB out: the batched path uploads 4x fewer
        bytes and runs BGR-flip + normalize on device."""
        import cv2

        cfg = self.config
        h, w = image.shape[:2]
        inp_h, inp_w = cfg.resolution
        s = max(h, w) * 1.0
        if cfg.upper_left:
            scale = inp_w / s
            mat = np.array([[scale, 0, 0], [0, scale, 0]], np.float32)
            c = np.array([0.0, 0.0], np.float32)
        else:
            c = np.array([w / 2.0, h / 2.0], np.float32)
            scale = inp_w / s
            mat = np.array([[scale, 0, inp_w / 2 - scale * c[0]],
                            [0, scale, inp_h / 2 - scale * c[1]]], np.float32)
        warped = cv2.warpAffine(image, mat, (inp_w, inp_h),
                                flags=cv2.INTER_LINEAR)
        return {"image_u8": warped[None],
                "meta": {"c": c, "s": s, "org_shape": (h, w),
                         "out_h": inp_h // cfg.down_ratio,
                         "out_w": inp_w // cfg.down_ratio}}


def round_logits(logi: np.ndarray) -> np.ndarray:
    """floor + (frac >= 0.5) (reference process_logic_output,
    lineless_table_process.py:662)."""
    fl = np.floor(logi)
    return (fl + (logi - fl >= 0.5)).astype(np.int64)


class LorePostProcessor:
    def __init__(self, config: LoreConfig):
        self.config = config

    def __call__(self, raw: Dict[str, Any], meta: Dict[str, Any]) -> Dict[str, Any]:
        cfg = self.config
        dets = np.asarray(raw["dets"][0], np.float32)        # (K, 8) fmap
        scores = np.asarray(raw["scores"][0], np.float32)
        valid = np.asarray(raw["valid"][0], bool)
        logi = np.asarray(raw["stacked_logi"][0], np.float32)

        out_w = meta["out_w"]
        h, w = meta["org_shape"]
        s = meta["s"]
        # inverse of the upper-left affine: fmap px -> image px
        scale_back = s / out_w if cfg.upper_left else s / out_w
        pts = dets.reshape(-1, 4, 2) * scale_back
        if not cfg.upper_left:
            # centered crop: undo translation
            pts[:, :, 0] += meta["c"][0] - s / 2
            pts[:, :, 1] += meta["c"][1] - s / 2
        pts[:, :, 0] = np.clip(pts[:, :, 0], 0, w)
        pts[:, :, 1] = np.clip(pts[:, :, 1], 0, h)

        axes = round_logits(logi)
        cells: List[Dict[str, Any]] = []
        for i in np.where(valid)[0]:
            quad = pts[i]
            x1, y1 = quad[:, 0].min(), quad[:, 1].min()
            x2, y2 = quad[:, 0].max(), quad[:, 1].max()
            if x2 - x1 < 1 or y2 - y1 < 1:
                continue
            cells.append({
                "bbox": [float(x1), float(y1), float(x2), float(y2)],
                "poly": quad.reshape(-1).tolist(),
                "logic": axes[i].tolist(),
                "score": float(scores[i]),
            })
        if cells:
            self.snap_to_grid(cells)
        return {"cells": cells, "type": "lore"}

    @staticmethod
    def snap_to_grid(cells: List[Dict[str, Any]], tol: float = 6.0) -> None:
        """Grid-snap post-fix (reference post_process_bbox_and_logits,
        ocr_table_structure_task.py:393-485 + merge_close_lines,
        utils/pdf_utils.py:804): cluster cell edges into shared row/col
        boundary lines and snap each bbox to them, so neighboring cells
        meet exactly and downstream HTML spans stay consistent."""
        from ..line_cell.grid import merge_positions

        xs = merge_positions([c["bbox"][0] for c in cells]
                             + [c["bbox"][2] for c in cells], tol)
        ys = merge_positions([c["bbox"][1] for c in cells]
                             + [c["bbox"][3] for c in cells], tol)

        def snap(v, bounds):
            j = int(np.argmin([abs(v - b) for b in bounds]))
            return bounds[j] if abs(v - bounds[j]) <= tol else v

        for c in cells:
            x1, y1, x2, y2 = c["bbox"]
            c["bbox"] = [snap(x1, xs), snap(y1, ys),
                         snap(x2, xs), snap(y2, ys)]
