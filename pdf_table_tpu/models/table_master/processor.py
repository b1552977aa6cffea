"""TableMaster pre/post processing.

Pre: resize to fixed square + imagenet norm (reference mtl_tabnet config).
Post: TableMasterLabelDecode behavior (slanet/table_postprocess.py:293):
token decode with eos stop, per-td bbox denorm; result feeds the master
matcher (tasks/table_matcher.py, use_master=True).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from ..slanet.vocab import StructureVocab
from .config import TableMasterConfig


class TableMasterPreProcessor:
    def __init__(self, config: TableMasterConfig):
        self.config = config

    def __call__(self, image: np.ndarray) -> Dict[str, Any]:
        import cv2

        h, w = image.shape[:2]
        th, tw = self.config.img_size
        resized = cv2.resize(image, (tw, th)).astype(np.float32)
        norm = (resized / 255.0 - np.array([0.485, 0.456, 0.406], np.float32)) \
            / np.array([0.229, 0.224, 0.225], np.float32)
        return {"image": norm[None].astype(np.float32),
                "meta": {"shape_list": (h, w, th / h, tw / w, 0, 0)}}


class TableMasterPostProcessor:
    def __init__(self, config: TableMasterConfig,
                 vocab: Optional[StructureVocab] = None,
                 cell_charset: Optional[List[str]] = None):
        self.config = config
        if vocab is None and config.dict_path:
            vocab = StructureVocab.from_dict_file(config.dict_path)
        self.vocab = vocab or StructureVocab()
        self.cell_charset = cell_charset  # MtlTabNet textline alphabet

    def __call__(self, raw: Dict[str, Any], meta: Dict[str, Any]) -> Dict[str, Any]:
        probs = np.asarray(raw["structure_probs"][0])
        locs = np.asarray(raw["loc_preds"][0])
        h, w = meta["shape_list"][0], meta["shape_list"][1]
        ids = probs.argmax(axis=1)
        confs = probs.max(axis=1)
        tokens: List[str] = []
        cells: List[Dict[str, Any]] = []
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
                cells.append({"bbox": b[:4].tolist()})
            tokens.append(tok)
            scores.append(float(confs[t]))
        result = {"structure_tokens": tokens, "cells": cells,
                  "score": float(np.mean(scores)) if scores else 0.0,
                  "type": "master"}
        # MtlTabNet cell-content branch output (decode_cells=True): greedy
        # ids per td slot -> text (master_convertor idx2str_cell:570)
        if "cell_ids" in raw:
            eos_c = int(raw.get("cell_eos_id", 0))
            cids = np.asarray(raw["cell_ids"][0])
            cvalid = np.asarray(raw["cell_valid"][0])
            texts: List[str] = []
            for k in range(len(cids)):
                if not cvalid[k]:
                    break
                chars = []
                for cid in cids[k]:
                    if cid == eos_c:
                        break
                    if self.cell_charset and cid < len(self.cell_charset):
                        chars.append(self.cell_charset[cid])
                texts.append("".join(chars))
            result["cell_texts"] = texts
            for cell, text in zip(result["cells"], texts):
                cell["text"] = text
        return result
