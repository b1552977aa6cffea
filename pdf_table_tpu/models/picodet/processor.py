"""PicoDet pre/post processing.

Pre: fixed resize to (H, W) = (800, 608), /255 + imagenet norm
(reference processor_picodet.py:33-113). Post: GFL decode — softmax over
reg_max+1 bins -> expected distance * stride from cell centers — then
per-class hard NMS and rescale to original image
(processor_picodet.py:184-301). The bin-expectation half runs on device in
XLA (ops below); candidate selection + NMS run host-side on small arrays.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from ...entity.enums import HtmlContentType
from ...entity.ocr_cell import OcrCell
from .config import PicoDetConfig


class PicoDetPreProcessor:
    def __init__(self, config: PicoDetConfig):
        self.config = config

    def __call__(self, image: np.ndarray) -> Dict[str, Any]:
        import cv2

        cfg = self.config
        img = image[:, :, ::-1].astype(np.float32)  # RGB->BGR (ref reads BGR)
        h, w = img.shape[:2]
        resized = cv2.resize(img, (cfg.img_width, cfg.img_height))
        resized = resized[:, :, ::-1] / 255.0  # model uses RGB imagenet stats
        resized = (resized - np.array(cfg.norm_mean, np.float32)) \
            / np.array(cfg.norm_std, np.float32)
        return {"image": resized[None].astype(np.float32),
                "org_shape": (h, w),
                "scale_factor": (cfg.img_height / h, cfg.img_width / w)}

    def resize_u8(self, image: np.ndarray) -> Dict[str, Any]:
        """Resize only, uint8 out: the batched path uploads raw bytes and
        normalizes on device (the BGR round-trip in __call__ cancels out —
        the net host op is an RGB resize)."""
        import cv2

        cfg = self.config
        h, w = image.shape[:2]
        resized = cv2.resize(image, (cfg.img_width, cfg.img_height))
        return {"image_u8": resized[None],
                "org_shape": (h, w),
                "scale_factor": (cfg.img_height / h, cfg.img_width / w)}


@functools.lru_cache(maxsize=32)
def _level_centers(fh: int, fw: int, stride: int) -> np.ndarray:
    hh, ww = np.meshgrid(np.arange(fh), np.arange(fw), indexing="ij")
    ct_row = (hh.reshape(-1) + 0.5) * stride
    ct_col = (ww.reshape(-1) + 0.5) * stride
    return np.stack([ct_col, ct_row, ct_col, ct_row], axis=1).astype(np.float32)


def gfl_expected_distance(box_dist: np.ndarray, reg_max: int) -> np.ndarray:
    """(HW, 4*(reg_max+1)) -> (HW, 4) expected distances (in stride units)."""
    d = box_dist.reshape(-1, reg_max + 1)
    d = d - d.max(axis=1, keepdims=True)
    e = np.exp(d)
    p = e / e.sum(axis=1, keepdims=True)
    exp = (p * np.arange(reg_max + 1)).sum(axis=1)
    return exp.reshape(-1, 4)


def _decode_topk(raw: Dict[str, Any], cfg: PicoDetConfig, k: int = 0):
    """On-device GFL decode + global top-k: the per-level head maps never
    leave the chip (their ~10 MB D2H dominated the tunnel wall clock;
    downloading k boxes is ~25 KB). raw: {'scores': [(B, HW, C)],
    'boxes': [(B, HW, 4*(reg_max+1))]} -> (boxes (B,k,4) input coords,
    scores (B,k,C))."""
    import jax
    import jax.numpy as jnp

    all_boxes, all_scores = [], []
    for stride, score, bd in zip(cfg.strides, raw["scores"], raw["boxes"]):
        fh = -(-cfg.img_height // stride)
        fw = -(-cfg.img_width // stride)
        centers = jnp.asarray(_level_centers(fh, fw, stride))
        B, HW, _ = score.shape
        d = bd.reshape(B, HW, 4, cfg.reg_max + 1).astype(jnp.float32)
        p = jax.nn.softmax(d, axis=-1)
        dist = (p * jnp.arange(cfg.reg_max + 1, dtype=jnp.float32)) \
            .sum(-1) * stride
        box = centers[None] + jnp.asarray([-1., -1., 1., 1.]) * dist
        all_boxes.append(box)
        all_scores.append(score.astype(jnp.float32))
    boxes = jnp.concatenate(all_boxes, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)
    # default budget follows the host path's per-level nms_top_k so real
    # candidates never fall off the global top-k on dense pages
    k = min(k if k > 0 else cfg.nms_top_k, scores.shape[1])
    _, top = jax.lax.top_k(scores.max(-1), k)               # (B, k)
    b = jnp.take_along_axis(boxes, top[..., None], axis=1)
    s = jnp.take_along_axis(scores, top[..., None], axis=1)
    return b, s


def device_decode_topk(raw: Dict[str, Any], cfg: PicoDetConfig,
                       k: int = 0):
    """decode+topk packed as ONE array [boxes | scores]: each extra D2H
    costs a tunnel round trip."""
    import jax.numpy as jnp

    b, s = _decode_topk(raw, cfg, k)
    return jnp.concatenate([b, s], axis=-1)


def device_nms_pack(b, s, cfg: PicoDetConfig):
    """Per-class greedy NMS on device over decoded candidates b (B,k,4) /
    s (B,k,C): downloads shrink to the survivors (B, C, keep_top_k, 5)
    and the host sheds the per-page hard_nms loop entirely (~30 ms/page
    of 1-core CPU in the batched pipeline; the reference runs NMS on
    host numpy, processor_picodet.py:301).

    Greedy NMS as a FIXED-POINT iteration instead of a sequential loop:
    the greedy keep set K is the unique solution of

        i in K  <=>  alive_i  and  no j in K with rank_j < rank_i
                     and IoU(j, i) >= thr

    (rank = stable score-descending order, index tie-break — identical to
    the host's np.argsort(-scores, kind='stable')). Iterating
    keep <- alive & ~any_j(keep_j & dominates[j, i]) from keep0 = alive
    settles items in rank order and converges to K in O(longest
    suppression chain) fully-vectorized O(k^2) steps — typically < 10 —
    where a step-per-kept-box loop needs keep_top_k sequential steps with
    scatters that the TPU compiler handles pathologically (a 100-step
    fori_loop variant compiled ~27 min on v5e; this form compiles in
    seconds and runs as dense VPU work).

    Survivor rows are [x1, y1, x2, y2, score] in keep (= score) order;
    tail rows pad with score 0."""
    import jax
    import jax.numpy as jnp

    from ...ops.nms import _iou_matrix

    B, k, C = s.shape
    kk = int(min(cfg.keep_top_k, k))
    thr = float(cfg.score_threshold)
    iou_thr = float(cfg.nms_threshold)

    iou = jax.vmap(_iou_matrix)(b)                     # (B,k,k), class-shared
    M = iou >= iou_thr                                 # suppression adjacency
    sc = jnp.moveaxis(s, -1, 1)                        # (B,C,k)
    alive = sc > thr
    # rank = inverse permutation of the stable desc argsort: lower rank =
    # higher score, ties broken toward the lower index (host parity)
    order = jnp.argsort(-sc, axis=-1, stable=True)     # (B,C,k)
    rank = jnp.argsort(order, axis=-1)
    # dominates[b,c,j,i]: j would suppress i if j is kept
    dom = M[:, None] & (rank[..., :, None] < rank[..., None, :])

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < k)

    def body(state):
        keep, _prev, it = state
        sup = (keep[..., :, None] & dom).any(axis=-2)  # (B,C,k)
        return alive & ~sup, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (alive, ~alive, jnp.int32(0)))

    # survivors in score order with index tie-break (XLA top_k is stable);
    # -inf marks non-kept so padding never collides with real score 0
    masked = jnp.where(keep, sc, -jnp.inf)
    top_s, top_i = jax.lax.top_k(masked, kk)           # (B,C,kk)
    bb = jnp.take_along_axis(b[:, None], top_i[..., None], axis=2)
    has = top_s > -jnp.inf
    rows = jnp.concatenate(
        [bb, jnp.where(has, top_s, 0.0)[..., None]], axis=-1)
    return jnp.where(has[..., None], rows, 0.0)        # (B,C,kk,5)


def device_decode_nms(raw: Dict[str, Any], cfg: PicoDetConfig):
    """GFL decode + top-k + per-class greedy NMS (see device_nms_pack)."""
    b, s = _decode_topk(raw, cfg)
    return device_nms_pack(b, s, cfg)


class PicoDetPostProcessor:
    def __init__(self, config: PicoDetConfig):
        self.config = config

    def __call__(self, scores: Sequence[np.ndarray],
                 boxes: Sequence[np.ndarray],
                 org_shape: Tuple[int, int]) -> Dict[str, Any]:
        """scores/boxes: per-level arrays (HW, C) / (HW, 4*(reg_max+1)) for
        one image. Returns {'bboxs': [{bbox,label,score,category_id}]}."""
        cfg = self.config
        ih, iw = cfg.img_height, cfg.img_width
        all_boxes, all_scores = [], []
        for stride, score, bd in zip(cfg.strides, scores, boxes):
            # ceil grid: the reference builds np.arange(input/stride) over a
            # possibly fractional bound (processor_picodet.py:207-209), and
            # the SAME-padded stride-2 convs emit ceil-sized maps (e.g.
            # 800/64 -> 13 rows, not 12).
            fh, fw = -(-ih // stride), -(-iw // stride)
            centers = _level_centers(fh, fw, stride)
            dist = gfl_expected_distance(np.asarray(bd), cfg.reg_max) * stride
            k = min(cfg.nms_top_k, score.shape[0])
            top = np.argsort(score.max(axis=1))[::-1][:k]
            decode = centers[top] + np.array([-1, -1, 1, 1], np.float32) * dist[top]
            all_boxes.append(decode)
            all_scores.append(np.asarray(score)[top])
        bboxes = np.concatenate(all_boxes, axis=0)
        confid = np.concatenate(all_scores, axis=0)
        return self.from_candidates(bboxes, confid, org_shape)

    def from_candidates(self, bboxes: np.ndarray, confid: np.ndarray,
                        org_shape: Tuple[int, int]) -> Dict[str, Any]:
        """Threshold + per-class NMS + rescale over decoded candidates
        (bboxes (N, 4) input coords, confid (N, C))."""
        from ...ops.nms import hard_nms

        cfg = self.config
        ih, iw = cfg.img_height, cfg.img_width
        results: List[Dict[str, Any]] = []
        oh, ow = org_shape
        sy, sx = ih / oh, iw / ow
        for ci in range(confid.shape[1]):
            probs = confid[:, ci]
            mask = probs > cfg.score_threshold
            if not mask.any():
                continue
            kept_boxes, kept_scores, _ = hard_nms(
                bboxes[mask], probs[mask],
                iou_threshold=cfg.nms_threshold, top_k=cfg.keep_top_k)
            for b, s in zip(kept_boxes, kept_scores):
                x1 = float(np.clip(b[0], 0, iw)) / sx
                y1 = float(np.clip(b[1], 0, ih)) / sy
                x2 = float(np.clip(b[2], 0, iw)) / sx
                y2 = float(np.clip(b[3], 0, ih)) / sy
                results.append({"bbox": [x1, y1, x2, y2],
                                "label": cfg.id2label[ci],
                                "score": float(s), "category_id": ci})
        results.sort(key=lambda r: -r["score"])
        return {"bboxs": results}

    def from_device_nms(self, packed: np.ndarray,
                        org_shape: Tuple[int, int]) -> Dict[str, Any]:
        """Host tail of :func:`device_decode_nms`: packed (C, keep_top_k, 5)
        survivor rows -> the same result dict as :meth:`from_candidates`
        (clip, rescale to org coords, global score sort) — no NMS left to
        do on host."""
        cfg = self.config
        ih, iw = cfg.img_height, cfg.img_width
        oh, ow = org_shape
        sy, sx = ih / oh, iw / ow
        results: List[Dict[str, Any]] = []
        for ci in range(packed.shape[0]):
            rows = packed[ci]
            for b in rows[rows[:, 4] > cfg.score_threshold]:
                x1 = float(np.clip(b[0], 0, iw)) / sx
                y1 = float(np.clip(b[1], 0, ih)) / sy
                x2 = float(np.clip(b[2], 0, iw)) / sx
                y2 = float(np.clip(b[3], 0, ih)) / sy
                results.append({"bbox": [x1, y1, x2, y2],
                                "label": cfg.id2label[ci],
                                "score": float(b[4]), "category_id": ci})
        results.sort(key=lambda r: -r["score"])
        return {"bboxs": results}

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
