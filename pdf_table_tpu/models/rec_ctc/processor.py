"""Recognition pre/post processing.

Pre: the reference sorts crops by aspect ratio and pads each mini-batch to
the widest crop (ocr_rec_pp processor:69-137) — dynamic shapes. TPU-native
version: static *width buckets*; every crop resizes to height H and pads to
the smallest bucket width >= its scaled width, so XLA compiles one program
per (bucket, batch-bucket) pair and everything else hits the cache.

Post: ops.ctc.ctc_greedy_decode on device + host charset mapping
(replaces CTCLabelDecode, rec_postprocess.py:167).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from .charset import Charset, resolve_charset
from .config import RecConfig


def resize_norm_crop(img: np.ndarray, out_h: int, bucket_w: int,
                     channels: int) -> Tuple[np.ndarray, int]:
    """Resize keeping aspect to height out_h, right-pad to bucket_w.
    Returns (H, W, C) uint8 and the valid (unpadded) width; the PP-rec
    normalization (x/127.5 - 1, resize_norm_img:44-67) happens on device so
    crops ship as uint8 (4x less transfer on the tunneled chip)."""
    import cv2

    h, w = img.shape[:2]
    scale = out_h / float(h)
    new_w = min(max(int(round(w * scale)), 1), bucket_w)
    resized = cv2.resize(img, (new_w, out_h))
    if channels == 1:
        if resized.ndim == 3:
            resized = cv2.cvtColor(resized, cv2.COLOR_RGB2GRAY)
        resized = resized[:, :, None]
    elif resized.ndim == 2:
        resized = np.repeat(resized[:, :, None], 3, axis=2)
    out = np.zeros((out_h, bucket_w, channels), np.uint8)
    out[:, :new_w] = resized
    return out, new_w


class RecPreProcessor:
    def __init__(self, config: RecConfig):
        self.config = config

    def pick_bucket(self, w: int, h: int) -> int:
        cfg = self.config
        scaled = int(round(w * cfg.img_height / max(h, 1)))
        for b in cfg.width_buckets:
            if scaled <= b:
                return b
        return cfg.width_buckets[-1]

    def chunked_convnext(self, crops: Sequence[np.ndarray]) -> Dict[str, Any]:
        """ConvNextViT path (reference processor_convnext_vit.py:88-96):
        gray keep-ratio pad to 32x804, split into 3 overlapping 300-px
        windows (stride 252) stacked as a sub-batch; decode re-concatenates
        the 3 chunks along time before CTC collapse."""
        import cv2

        cfg = self.config
        cw, ov = cfg.chunk_width, cfg.chunk_overlap
        full_w = 3 * cw - 2 * ov  # 804
        imgs = []
        for c in crops:
            g = cv2.cvtColor(c, cv2.COLOR_RGB2GRAY) if c.ndim == 3 else c
            h, w = g.shape
            ratio = w / float(h)
            tw = min(int(cfg.img_height * ratio), full_w)
            g = cv2.resize(g, (max(tw, 1), cfg.img_height))
            canvas = np.zeros((cfg.img_height, full_w), np.uint8)
            canvas[:, :g.shape[1]] = g
            for i in range(3):
                left = (cw - ov) * i
                imgs.append(canvas[:, left:left + cw, None])
        group = {"bucket": cw,
                 "images": np.stack(imgs),
                 "indices": np.arange(len(crops), dtype=np.int64),
                 "widths": np.full(len(crops), full_w, np.int64),
                 "chunked": 3}
        return {"groups": [group], "n": len(crops)}

    def __call__(self, crops: Sequence[np.ndarray]) -> Dict[str, Any]:
        """crops: list of HWC uint8 RGB. Groups by width bucket.

        Returns {'groups': [(bucket_w, images (N,H,Wb,C), indices, widths)]}
        keeping the original crop order recoverable via indices."""
        cfg = self.config
        if cfg.backbone == "convnext_vit" and crops:
            return self.chunked_convnext(crops)
        groups: Dict[int, List[int]] = {}
        for i, c in enumerate(crops):
            b = self.pick_bucket(c.shape[1], c.shape[0])
            groups.setdefault(b, []).append(i)
        out = []
        for b, idxs in sorted(groups.items()):
            imgs, widths = [], []
            for i in idxs:
                img, vw = resize_norm_crop(crops[i], cfg.img_height, b,
                                           cfg.img_channels)
                imgs.append(img)
                widths.append(vw)
            out.append({"bucket": b,
                        "images": np.stack(imgs),
                        "indices": np.array(idxs, np.int64),
                        "widths": np.array(widths, np.int64)})
        return {"groups": out, "n": len(crops)}


class RecPostProcessor:
    def __init__(self, config: RecConfig, charset: Charset = None):
        self.config = config
        self.charset = charset or resolve_charset(config.charset_name,
                                                  config.use_space_char)

    def __call__(self, logits, indices, n_total: int,
                 texts: List[str], scores: List[float],
                 decoded=None) -> None:
        """Decode one bucket group's logits into the (pre-sized) output
        lists at their original positions. ``decoded`` takes pre-computed
        (ids, keep, conf) when CTC greedy decode ran fused on device."""
        if decoded is not None:
            ids, keep, conf = decoded
        else:
            from ...ops.ctc import ctc_greedy_decode

            ids, keep, conf = ctc_greedy_decode(
                logits, blank_id=self.config.blank_id)
        ids = np.asarray(ids)
        keep = np.asarray(keep)
        conf = np.asarray(conf)
        for row, gi in enumerate(np.asarray(indices)):
            kept = ids[row][keep[row]]
            texts[gi] = self.charset.decode_ids(kept.tolist())
            scores[gi] = float(conf[row])
