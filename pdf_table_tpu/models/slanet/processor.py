"""SLANet pre/post processing.

Pre: resize longest side to table_max_len, imagenet normalize, pad to
square (reference SLANetPreprocessor, processor_slanet.py:25-110).

Post: greedy token decode with eos stop + per-<td> bbox denormalization
(reference TableLabelDecode, table_postprocess.py:172-290), then
token+text -> HTML via the TableMatch pipeline (tasks/table_matcher.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .config import SLANetConfig
from .vocab import StructureVocab


class SLANetPreProcessor:
    def __init__(self, config: SLANetConfig):
        self.config = config

    def __call__(self, image: np.ndarray) -> Dict[str, Any]:
        import cv2

        L = self.config.table_max_len
        h, w = image.shape[:2]
        ratio = L / max(h, w)
        nh, nw = int(round(h * ratio)), int(round(w * ratio))
        resized = cv2.resize(image, (nw, nh)).astype(np.float32)
        norm = (resized / 255.0 - np.array([0.485, 0.456, 0.406], np.float32)) \
            / np.array([0.229, 0.224, 0.225], np.float32)
        padded = np.zeros((L, L, 3), np.float32)
        padded[:nh, :nw] = norm
        return {"image": padded[None],
                "shape_list": (h, w, ratio, ratio, L - nh, L - nw)}


class SLANetPostProcessor:
    def __init__(self, config: SLANetConfig,
                 vocab: Optional[StructureVocab] = None):
        self.config = config
        if vocab is None and config.dict_path:
            vocab = StructureVocab.from_dict_file(
                config.dict_path, config.merge_no_span_structure)
        self.vocab = vocab or StructureVocab()

    def __call__(self, raw: Dict[str, Any],
                 shape_list: Tuple) -> Dict[str, Any]:
        probs = np.asarray(raw["structure_probs"][0])     # (T, V)
        locs = np.asarray(raw["loc_preds"][0])            # (T, loc_reg)
        h, w = shape_list[0], shape_list[1]
        ids = probs.argmax(axis=1)
        confs = probs.max(axis=1)

        tokens: List[str] = []
        boxes: List[List[float]] = []
        scores: List[float] = []
        for t, tid in enumerate(ids):
            if t > 0 and tid == self.vocab.eos_id:
                break
            if tid in (self.vocab.sos_id, self.vocab.eos_id):
                continue
            tok = self.vocab.tokens[tid]
            if self.vocab.is_td(tok):
                b = locs[t].copy()
                b[0::2] *= w
                b[1::2] *= h
                boxes.append(b.tolist())
            tokens.append(tok)
            scores.append(float(confs[t]))
        # cells in TSR schema: bbox from the 4-point (or xyxy) regression
        cells = []
        for b in boxes:
            if len(b) >= 8:
                xs, ys = b[0::2], b[1::2]
                bbox = [min(xs), min(ys), max(xs), max(ys)]
            else:
                bbox = b[:4]
            cells.append({"bbox": bbox, "poly": b})
        return {"structure_tokens": tokens,
                "cells": cells,
                "score": float(np.mean(scores)) if scores else 0.0,
                "type": "slanet"}
