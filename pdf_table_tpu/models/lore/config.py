"""LORE table-structure-recognition config.

Reference: model/lore/configuration_lore.py + ModelArguments defaults
(entity/common_entity.py:84-122): DLA-34 or ResNet-18 CenterNet detector
with heads {hm:2, st:8, wh:8, ax:256, cr:256, reg:2}
(modeling_lore.py:84), transformer logical-location regressor
(lore_processor.py:399: input 256, hidden 256, 4 layers, 8 heads, stacking
regressor on top), input resolution 768 (wireless) / 1024 (wtw).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple


@dataclass
class LoreConfig:
    backbone: str = "dla34"          # dla34 | resnet18
    task_type: str = "wtw"           # wtw | wireless | ptn
    resolution: Tuple[int, int] = (768, 768)
    down_ratio: int = 4
    # decode
    max_objs: int = 300              # K cell slots (static; reference K=3000
                                     # but >99% filtered at vis_thresh)
    max_corners: int = 600           # MK corner slots (reference MK=5000)
    vis_thresh: float = 0.15
    vis_thresh_corner: float = 0.3   # corner-channel threshold (wiz_rev)
    wiz_rev: bool = False            # snap cell vertices to corner dets
                                     # (wtw config, configuration_lore.py:97)
    upper_left: bool = True          # corner-anchored affine (wtw/wireless)
    # processor
    hidden_size: int = 256
    tsfm_layers: int = 4
    stacking_layers: int = 4
    num_heads: int = 8
    d_ff: int = 2048                 # FeedForward width (lore_processor.py:229)
    max_fmp_size: int = 256          # position-embedding vocab
    wiz_2dpe: bool = True
    wiz_stacking: bool = True
    # heads
    head_conv: int = 256
    num_classes: int = 2             # cell + corner-center channels
    dtype: str = "float32"

    @classmethod
    def wtw(cls, **kw) -> "LoreConfig":
        base = dict(task_type="wtw", resolution=(1024, 1024),
                    wiz_rev=True)
        base.update(kw)
        return cls(**base)

    @classmethod
    def wireless(cls, **kw) -> "LoreConfig":
        base = dict(task_type="wireless", resolution=(768, 768))
        base.update(kw)
        return cls(**base)
