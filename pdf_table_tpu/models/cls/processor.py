"""PULC pre/post processing (reference model/cls/image_processing_pulc.py
behavior: resize-short + center-crop (or direct resize), imagenet norm;
post: topk labels or multilabel thresholds)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .config import ClsPulcConfig


class PulcPreProcessor:
    def __init__(self, config: ClsPulcConfig):
        self.config = config

    def __call__(self, image: np.ndarray) -> Dict[str, Any]:
        import cv2

        cfg = self.config
        img = image.astype(np.float32)
        th, tw = cfg.img_size
        if cfg.resize_short:
            h, w = img.shape[:2]
            scale = cfg.resize_short / min(h, w)
            img = cv2.resize(img, (max(int(round(w * scale)), tw),
                                   max(int(round(h * scale)), th)))
            h, w = img.shape[:2]
            y0 = (h - th) // 2
            x0 = (w - tw) // 2
            img = img[y0:y0 + th, x0:x0 + tw]
        else:
            img = cv2.resize(img, (tw, th))
        img = (img / 255.0 - np.array([0.485, 0.456, 0.406], np.float32)) \
            / np.array([0.229, 0.224, 0.225], np.float32)
        return {"image": img[None].astype(np.float32)}


class PulcPostProcessor:
    def __init__(self, config: ClsPulcConfig, threshold: float = 0.5):
        self.config = config
        self.threshold = threshold

    def __call__(self, probs: np.ndarray) -> Dict[str, Any]:
        cfg = self.config
        probs = np.asarray(probs).reshape(-1)
        if cfg.multilabel:
            idx = np.where(probs >= self.threshold)[0]
            return {"labels": [cfg.labels[i] for i in idx],
                    "scores": probs[idx].tolist()}
        order = np.argsort(-probs)[:cfg.topk]
        return {"labels": [cfg.labels[i] for i in order],
                "scores": probs[order].tolist(),
                "label": cfg.labels[order[0]],
                "score": float(probs[order[0]])}
