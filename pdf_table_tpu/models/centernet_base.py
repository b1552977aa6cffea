"""Shared DLA-34 CenterNet trunk with configurable heads.

Used by DocXLayout (model/docx_layout/model_dla.py:226) and Cycle-CenterNet
(model/center_net/modeling_centernet.py:274,619) — both are DLA-34 +
upsampling + per-head conv stacks, differing only in the head dict.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .lore.detector import CenterHeads
from .lore.dla import DLA34, DLAUp, IDAUp


class DLACenterNet(nn.Module):
    heads: Tuple[Tuple[str, int], ...]
    head_conv: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = jnp.dtype(self.dtype)
        levels = DLA34(dtype=d, name="base")(x, train)
        first_level, last_level = 2, 5
        feats = levels[first_level:]
        outs = DLAUp(tuple(f.shape[-1] for f in feats), dtype=d,
                     name="dla_up")(feats, train=train)
        y = list(outs[:last_level - first_level])
        y = IDAUp(y[0].shape[-1], (1, 2, 4), dtype=d,
                  name="ida_up")(y, 0, len(y), train=train)
        return CenterHeads(self.head_conv, heads=self.heads, dtype=d,
                           name="heads")(y[-1])
