"""LGPMA in flax: two-stage cell detector with pyramid-mask heads.

Reference structure (model/table/lgpma/model_lgpma.py TwoStageDetector:366,
LGPMA:480): ResNet-50 + FPN -> RPN -> RoIAlign -> bbox head (cell boxes)
+ LPMA local pyramid-mask head (per-RoI soft text-region masks) and GPMA
global pyramid-mask + segmentation branch.

TPU-native: static proposal count (top-K objectness, no dynamic filtering
inside jit), RoIAlign via ops.roi_align gathers, all stages in one program.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_align import roi_align
from ..layers import FPN, ResNet
from .config import LgpmaConfig


class RPNHead(nn.Module):
    """Shared 3x3 conv -> objectness + 4 deltas per anchor
    (mmdet RPNHead shape)."""

    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype,
                                name="conv")(x))
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name="cls")(h)
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name="reg")(h)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


class BBoxHead(nn.Module):
    """2 fc -> cls score (cell/bg) + bbox deltas (mmdet Shared2FCBBoxHead)."""

    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois):  # (N, S, S, C)
        N = rois.shape[0]
        x = rois.reshape(N, -1)
        x = jax.nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                 name="fc1")(x))
        x = jax.nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                 name="fc2")(x))
        score = nn.Dense(2, dtype=self.dtype, name="cls")(x)
        deltas = nn.Dense(4, dtype=self.dtype, name="reg")(x)
        return (jax.nn.softmax(score.astype(jnp.float32), -1)[:, 1],
                deltas.astype(jnp.float32))


class LPMAHead(nn.Module):
    """Per-RoI pyramid mask head: 4 convs + deconv -> 3 channels
    (text mask + horizontal/vertical pyramid ramps;
    reference lpma_mask_head.py)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois):
        x = rois
        for i in range(4):
            x = jax.nn.relu(nn.Conv(128, (3, 3), dtype=self.dtype,
                                    name=f"conv{i}")(x))
        x = nn.ConvTranspose(128, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="up")(x)
        x = jax.nn.relu(x)
        return jax.nn.sigmoid(nn.Conv(3, (1, 1), dtype=self.dtype,
                                      name="out")(x).astype(jnp.float32))


class GPMAHead(nn.Module):
    """Global branch on FPN level 0: segmentation + global pyramid masks
    (reference gpma_mask_head.py)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        x = feat
        for i in range(2):
            x = jax.nn.relu(nn.Conv(128, (3, 3), dtype=self.dtype,
                                    name=f"conv{i}")(x))
        return jax.nn.sigmoid(nn.Conv(3, (1, 1), dtype=self.dtype,
                                      name="out")(x).astype(jnp.float32))


def decode_deltas(boxes: jax.Array, deltas: jax.Array) -> jax.Array:
    """Standard (dx, dy, dw, dh) box decoding."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    ncx = cx + deltas[:, 0] * w
    ncy = cy + deltas[:, 1] * h
    nw = w * jnp.exp(jnp.clip(deltas[:, 2], -4.0, 4.0))
    nh = h * jnp.exp(jnp.clip(deltas[:, 3], -4.0, 4.0))
    return jnp.stack([ncx - nw / 2, ncy - nh / 2,
                      ncx + nw / 2, ncy + nh / 2], axis=1)


class LGPMA(nn.Module):
    config: LgpmaConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        d = jnp.dtype(cfg.dtype)
        feats = ResNet(cfg.backbone_depth, dtype=d, name="backbone")(x, train)
        # FPN fuse returns stride-4 map; keep per-level laterals for RPN
        p2 = FPN(cfg.fpn_channels, dtype=d, name="neck")(feats, train)

        nA = len(cfg.anchor_scales) * len(cfg.anchor_ratios)
        cls, reg = RPNHead(nA, dtype=d, name="rpn")(p2)
        B, H, W, _ = cls.shape
        assert B == 1, "single-image program; batch via vmap/pmap outside"

        # anchors at stride 4 on the fused map
        ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) * 4
        xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * 4
        scales = jnp.asarray(cfg.anchor_scales)
        ratios = jnp.asarray(cfg.anchor_ratios)
        aw = (scales[:, None] * jnp.sqrt(ratios)[None, :]).reshape(-1) * 4
        ah = (scales[:, None] / jnp.sqrt(ratios)[None, :]).reshape(-1) * 4
        cy = jnp.broadcast_to(ys[:, None, None], (H, W, nA))
        cx = jnp.broadcast_to(xs[None, :, None], (H, W, nA))
        anchors = jnp.stack([cx - aw / 2, cy - ah / 2,
                             cx + aw / 2, cy + ah / 2], -1).reshape(-1, 4)

        obj = cls.reshape(-1)
        deltas = reg.reshape(-1, 4)
        K = cfg.num_proposals
        top_scores, top_idx = jax.lax.top_k(obj, K)
        props = decode_deltas(anchors[top_idx], deltas[top_idx])
        img_h, img_w = x.shape[1] * 1.0, x.shape[2] * 1.0
        props = jnp.stack([jnp.clip(props[:, 0], 0, img_w),
                           jnp.clip(props[:, 1], 0, img_h),
                           jnp.clip(props[:, 2], 0, img_w),
                           jnp.clip(props[:, 3], 0, img_h)], 1)

        # RoI heads on the stride-4 map
        rois = roi_align(p2[0], props / 4.0, cfg.roi_size)
        scores, bdeltas = BBoxHead(cfg.fc_dim, dtype=d, name="bbox_head")(rois)
        boxes = decode_deltas(props, bdeltas)

        mask_rois = roi_align(p2[0], props / 4.0, cfg.mask_roi_size)
        lpma = LPMAHead(dtype=d, name="lpma_head")(mask_rois)
        gpma = GPMAHead(dtype=d, name="gpma_head")(p2)

        return {"proposals": props[None], "boxes": boxes[None],
                "scores": scores[None], "rpn_scores": top_scores[None],
                "lpma_masks": lpma[None], "gpma_masks": gpma}
