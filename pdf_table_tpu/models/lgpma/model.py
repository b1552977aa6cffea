"""LGPMA in flax: mmdet-structure two-stage cell detector with pyramid
mask heads, rebuilt to the reference architecture so its mmcv checkpoint
converts layer-for-layer.

Reference structure (model/table/lgpma/lgpma_config.py + model_lgpma.py
LGPMA:480 / TwoStageDetector:366): ResNet-50 -> FPN(num_outs=5) ->
RPNHead shared over 5 levels (anchors scales [4,8,16] x 6 ratios, strides
[4,8,16,32,64]) -> proposals -> SingleRoIExtractor (RoIAlign 7, level by
finest_scale=56) -> Shared2FCBBoxHead (2 fg classes, class-specific reg,
stds [.1,.1,.2,.2]) + LPMAMaskHead (4 convs + deconv, num_classes+2
channels: per-class text masks + horizontal/vertical pyramid ramps,
lpma_mask_head.py:371-425) and GPMAMaskHead on P2 (1x7 context convs,
gpma_mask_head.py:61-135).

TPU redesign (not a translation): static per-level top-k proposals with a
dense suppress-by-higher-score NMS inside the jit (no dynamic shapes), RoI
level routing computed as masks over 4 parallel RoIAligns, exact host-side
greedy NMS on the final detections (processor.py).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_align import roi_align
from ..layers import ResNet
from .config import LgpmaConfig


class FPN(nn.Module):
    """mmdet FPN: lateral 1x1 + output 3x3 per level, P6 = maxpool(P5)
    (lgpma_config.py neck: in [256,512,1024,2048] -> 256, num_outs=5)."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        d = self.dtype
        lats = [nn.Conv(self.out_channels, (1, 1), dtype=d,
                        name=f"lateral{i}")(f)
                for i, f in enumerate(feats)]
        for i in range(len(lats) - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(lats[i], 2, axis=1), 2, axis=2)
            up = up[:, :lats[i - 1].shape[1], :lats[i - 1].shape[2]]
            lats[i - 1] = lats[i - 1] + up
        outs = [nn.Conv(self.out_channels, (3, 3), dtype=d,
                        name=f"fpn{i}")(l)
                for i, l in enumerate(lats)]
        # P6: stride-2 max pool of P5 (mmdet default extra level)
        outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


class RPNHead(nn.Module):
    """Shared 3x3 conv -> sigmoid objectness + 4 deltas per anchor
    (mmdet RPNHead; rpn_head.py)."""

    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype,
                                name="rpn_conv")(x))
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name="rpn_cls")(h)
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name="rpn_reg")(h)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


class Shared2FCBBoxHead(nn.Module):
    """2 shared fc -> (num_classes+1) cls logits + per-class 4 deltas
    (mmdet Shared2FCBBoxHead; convfc_bbox_head.py)."""

    num_classes: int = 2
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois):  # (N, S, S, C)
        N = rois.shape[0]
        # torch flattens NCHW -> match that order for fc weight conversion
        x = jnp.transpose(rois, (0, 3, 1, 2)).reshape(N, -1)
        x = jax.nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                 name="fc1")(x))
        x = jax.nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                 name="fc2")(x))
        logits = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          name="fc_cls")(x).astype(jnp.float32)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          name="fc_reg")(x).astype(jnp.float32)
        return jax.nn.softmax(logits, -1), deltas.reshape(
            N, self.num_classes, 4)


class LPMAMaskHead(nn.Module):
    """FCNMaskHead (4 convs 256 + deconv 2x) with conv_logits widened to
    num_classes + 2 channels: per-class text-region masks + horizontal and
    vertical local pyramid ramps (lpma_mask_head.py:410-425)."""

    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois):
        x = rois
        for i in range(4):
            x = jax.nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype,
                                    name=f"conv{i}")(x))
        x = jax.nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                                         dtype=self.dtype, name="upsample")(x))
        out = nn.Conv(self.num_classes + 2, (1, 1), dtype=self.dtype,
                      name="conv_logits")(x)
        return jax.nn.sigmoid(out.astype(jnp.float32))


class GPMAMaskHead(nn.Module):
    """Global branch on P2: 3x3 + two 1x7 context convs summed, 3x3, then
    1-channel seg + 2-channel global pyramid reg
    (gpma_mask_head.py:61-135; ConvModule with no norm = conv+relu)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p2):
        d = self.dtype
        relu = jax.nn.relu
        x_p4 = relu(nn.Conv(256, (3, 3), dtype=d, name="P4_conv")(p2))
        x_1x7 = relu(nn.Conv(256, (1, 7), dtype=d,
                             name="channel4_1x7_conv")(p2))
        x_p4_1x7 = relu(nn.Conv(256, (1, 7), dtype=d,
                                name="P4_1x7_conv")(x_p4))
        x = x_p4_1x7 + x_p4 + x_1x7
        x = relu(nn.Conv(256, (3, 3), dtype=d, name="rpn4")(x))
        seg = nn.Conv(1, (1, 1), dtype=d,
                      name="conv_logits_seg")(x).astype(jnp.float32)
        reg = nn.Conv(2, (1, 1), dtype=d,
                      name="conv_logits_reg")(x).astype(jnp.float32)
        return jax.nn.sigmoid(seg), jax.nn.sigmoid(reg)


def mmdet_anchors(H: int, W: int, stride: int,
                  scales: Sequence[float],
                  ratios: Sequence[float]) -> jnp.ndarray:
    """mmdet AnchorGenerator: base size = stride; per ratio r the anchor is
    (w, h) = (base*scale/sqrt(r), base*scale*sqrt(r)); ratio-major order;
    centers at grid*stride + stride/2... mmdet uses corner offset 0, i.e.
    centers (x*stride + (base-1)/2 is legacy); modern mmdet centers are
    x*stride + 0.5*base with center_offset=0 -> base anchors centered at
    (0,0) shifted by grid*stride."""
    scales = jnp.asarray(scales, jnp.float32)
    ratios = jnp.asarray(ratios, jnp.float32)
    h_r = jnp.sqrt(ratios)
    w_r = 1.0 / h_r
    ws = (w_r[:, None] * scales[None, :]).reshape(-1) * stride   # (A,)
    hs = (h_r[:, None] * scales[None, :]).reshape(-1) * stride
    base = jnp.stack([-ws / 2, -hs / 2, ws / 2, hs / 2], axis=1)  # (A, 4)
    sy = jnp.arange(H, dtype=jnp.float32) * stride
    sx = jnp.arange(W, dtype=jnp.float32) * stride
    shift = jnp.stack(
        [jnp.broadcast_to(sx[None, :], (H, W)),
         jnp.broadcast_to(sy[:, None], (H, W)),
         jnp.broadcast_to(sx[None, :], (H, W)),
         jnp.broadcast_to(sy[:, None], (H, W))], axis=-1)         # (H, W, 4)
    return (shift[:, :, None, :] + base[None, None]).reshape(-1, 4)


def decode_deltas(boxes: jax.Array, deltas: jax.Array,
                  stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
                  ) -> jax.Array:
    """mmdet DeltaXYWHBBoxCoder.decode (means 0)."""
    s = jnp.asarray(stds, jnp.float32)
    d = deltas * s
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    ncx = cx + d[:, 0] * w
    ncy = cy + d[:, 1] * h
    nw = w * jnp.exp(jnp.clip(d[:, 2], -4.0, 4.0))
    nh = h * jnp.exp(jnp.clip(d[:, 3], -4.0, 4.0))
    return jnp.stack([ncx - nw / 2, ncy - nh / 2,
                      ncx + nw / 2, ncy + nh / 2], axis=1)


def _pairwise_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.maximum((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]), 0.0)
    area_b = jnp.maximum((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]), 0.0)
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-6)


def fast_nms_keep(boxes: jax.Array, scores: jax.Array,
                  iou_thresh: float) -> jax.Array:
    """Suppress any box overlapped by a strictly higher-scored box (dense
    'fast NMS'; static shape for jit — the exact greedy pass runs on host
    for the final detections)."""
    iou = _pairwise_iou(boxes, boxes)
    higher = (scores[None, :] > scores[:, None]) | (
        (scores[None, :] == scores[:, None])
        & (jnp.arange(scores.shape[0])[None, :]
           < jnp.arange(scores.shape[0])[:, None]))
    return ~jnp.any((iou > iou_thresh) & higher, axis=1)


class LGPMA(nn.Module):
    config: LgpmaConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        d = jnp.dtype(cfg.dtype)
        feats = ResNet(cfg.backbone_depth, dtype=d, name="backbone")(x, train)
        levels = FPN(cfg.fpn_channels, dtype=d, name="neck")(feats)

        nA = len(cfg.anchor_scales) * len(cfg.anchor_ratios)
        rpn = RPNHead(nA, dtype=d, name="rpn_head")
        img_h, img_w = float(x.shape[1]), float(x.shape[2])

        # per-level static top-k proposals
        all_boxes, all_scores = [], []
        for lvl, stride in enumerate(cfg.anchor_strides):
            cls, reg = rpn(levels[lvl])
            B, H, W, _ = cls.shape
            assert B == 1, "single-image program; batch via vmap outside"
            anchors = mmdet_anchors(H, W, stride, cfg.anchor_scales,
                                    cfg.anchor_ratios)
            obj = jax.nn.sigmoid(cls.reshape(-1))
            deltas = reg.reshape(-1, 4)
            k = min(cfg.rpn_pre_topk, obj.shape[0])
            top_s, top_i = jax.lax.top_k(obj, k)
            props = decode_deltas(anchors[top_i], deltas[top_i])
            props = jnp.stack([jnp.clip(props[:, 0], 0, img_w),
                               jnp.clip(props[:, 1], 0, img_h),
                               jnp.clip(props[:, 2], 0, img_w),
                               jnp.clip(props[:, 3], 0, img_h)], 1)
            all_boxes.append(props)
            all_scores.append(top_s)
        boxes = jnp.concatenate(all_boxes, 0)
        scores = jnp.concatenate(all_scores, 0)
        keep = fast_nms_keep(boxes, scores, cfg.rpn_nms_thresh)
        scores = jnp.where(keep, scores, -1.0)
        P = cfg.num_proposals
        top_s, top_i = jax.lax.top_k(scores, P)
        props = boxes[top_i]                                    # (P, 4)

        # RoI features: level by finest_scale rule (SingleRoIExtractor)
        def extract(levels, rois, out_size):
            w = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-3)
            h = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-3)
            lvl = jnp.floor(jnp.log2(jnp.sqrt(w * h)
                                     / cfg.finest_scale + 1e-6))
            lvl = jnp.clip(lvl, 0, 3).astype(jnp.int32)
            out = 0.
            for li, stride in enumerate(cfg.anchor_strides[:4]):
                r = roi_align(levels[li][0], rois / stride, out_size)
                out = out + jnp.where((lvl == li)[:, None, None, None],
                                      r, 0.0)
            return out

        rois7 = extract(levels, props, cfg.roi_size)
        cls_probs, bdeltas = Shared2FCBBoxHead(
            cfg.num_classes, cfg.fc_dim, dtype=d, name="bbox_head")(rois7)
        det_boxes = []
        for c in range(cfg.num_classes):
            db = decode_deltas(props, bdeltas[:, c], cfg.bbox_stds)
            db = jnp.stack([jnp.clip(db[:, 0], 0, img_w),
                            jnp.clip(db[:, 1], 0, img_h),
                            jnp.clip(db[:, 2], 0, img_w),
                            jnp.clip(db[:, 3], 0, img_h)], 1)
            det_boxes.append(db)
        det_boxes = jnp.stack(det_boxes, 1)                     # (P, C, 4)

        # mask branch on the top-scoring refined boxes (static D slots)
        fg = cls_probs[:, :cfg.num_classes]
        best_cls = jnp.argmax(fg, axis=1)
        best_score = jnp.max(fg, axis=1)
        D = min(cfg.mask_top, P)
        m_s, m_i = jax.lax.top_k(best_score, D)
        m_boxes = jnp.take_along_axis(
            det_boxes, best_cls[:, None, None], axis=1)[:, 0][m_i]
        rois14 = extract(levels, m_boxes, cfg.mask_roi_size)
        lpma = LPMAMaskHead(cfg.num_classes, dtype=d,
                            name="mask_head")(rois14)
        seg, reg = GPMAMaskHead(dtype=d, name="global_seg_head")(levels[0])

        return {"proposals": props[None], "cls_probs": cls_probs[None],
                "det_boxes": det_boxes[None],
                "mask_boxes": m_boxes[None], "mask_scores": m_s[None],
                "mask_cls": best_cls[m_i][None], "mask_idx": m_i[None],
                "lpma_masks": lpma[None],
                "gpma_seg": seg, "gpma_reg": reg}
