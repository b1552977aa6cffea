"""LGPMA config.

Reference: model/table/lgpma/ (~8k LoC of vendored mini-mmdet:
TwoStageDetector:366, LGPMARoIHead, lpma_mask_head.py, gpma_mask_head.py,
post_lgpma.py; cfg in lgpma_config.py: ResNet-50 + FPN, RPN, RoI heads).
TPU build: compact two-stage detector with static proposal count — the
component inventory (RPN, RoIAlign, bbox head, LPMA local masks, GPMA
global masks, aligned-bbox refinement) maps one-to-one; mmdet's config
registry machinery is replaced by this dataclass.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple


@dataclass
class LgpmaConfig:
    backbone_depth: int = 50
    fpn_channels: int = 256
    max_side: int = 800
    # RPN
    anchor_scales: Tuple[float, ...] = (4.0, 8.0, 16.0)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    num_proposals: int = 256          # static top-K proposals
    rpn_level: int = 1                # FPN level used for RoI pooling (s8)
    # RoI heads
    roi_size: int = 7
    mask_roi_size: int = 14
    fc_dim: int = 1024
    score_thresh: float = 0.5
    nms_thresh: float = 0.5
    dtype: str = "float32"
