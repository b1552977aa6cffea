"""LORE cell detector: DLA-34+DCN (DLASeg) or ResNet-18 variant, with
CenterNet heads {hm:2, st:8, wh:8, ax:256, cr:256, reg:2}.

Reference: get_dla_dcn / DLASeg (model/lore/lore_dla_34.py:140,199) and
LoreDetectModel (lore_detector.py:148). Output maps at stride 4 (NHWC).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import BasicBlock, ConvBNAct
from .config import LoreConfig
from .dla import DLA34, DLAUp, IDAUp

def head_channels(hidden_size: int = 256) -> Dict[str, int]:
    """{hm:2, st:8, wh:8, ax:H, cr:H, reg:2} (modeling_lore.py:84; ax/cr
    carry the processor's feature width, 256 in the reference)."""
    return {"hm": 2, "st": 8, "wh": 8, "ax": hidden_size, "cr": hidden_size,
            "reg": 2}


class CenterHeads(nn.Module):
    """Per-head conv3x3(head_conv)+relu -> conv1x1(out)
    (reference DLASeg head construction, lore_dla_34.py:160-182).
    ``heads`` overrides the LORE head set — DocXLayout and Cycle-CenterNet
    reuse this module with their own head dicts."""

    head_conv: int = 256
    hidden_size: int = 256
    heads: Optional[Tuple[Tuple[str, int], ...]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = {}
        head_map = (dict(self.heads) if self.heads is not None
                    else head_channels(self.hidden_size))
        for head, ch in head_map.items():
            y = nn.Conv(self.head_conv, (3, 3), dtype=self.dtype,
                        name=f"{head}_conv")(x)
            y = jax.nn.relu(y)
            # hm head biased to rare-positive prior (reference fills -2.19)
            bias_init = nn.initializers.constant(-2.19) if head == "hm" \
                else nn.initializers.zeros
            y = nn.Conv(ch, (1, 1), bias_init=bias_init, dtype=self.dtype,
                        name=f"{head}_out")(y)
            out[head] = y.astype(jnp.float32)
        return out


class DLASegDetector(nn.Module):
    """DLA-34 -> DLAUp -> final IDAUp -> heads at stride 4."""

    config: LoreConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        d = jnp.dtype(cfg.dtype)
        levels = DLA34(dtype=d, name="base")(x, train)
        first_level = 2  # down_ratio 4
        last_level = 5
        feats = levels[first_level:]
        outs = DLAUp(tuple(f.shape[-1] for f in feats), dtype=d,
                     name="dla_up")(feats, train=train)
        y = list(outs[:last_level - first_level])
        y = IDAUp(y[0].shape[-1], (1, 2, 4), dtype=d,
                  name="ida_up")(y, 0, len(y), train=train)
        return CenterHeads(cfg.head_conv, cfg.hidden_size, dtype=d,
                           name="heads")(y[-1])


class ResNetDetector(nn.Module):
    """ResNet-18 + 1x1 adaptions + 3 upsample stages with skip sums
    (reference LoreDetectModel, lore_detector.py:148-226)."""

    config: LoreConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        d = jnp.dtype(cfg.dtype)
        x = ConvBNAct(64, (7, 7), (2, 2), act="relu", dtype=d,
                      name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        c0 = x                                             # stride 4
        widths = (64, 128, 256, 256)
        feats = []
        for i, w in enumerate(widths):
            for j in range(2):
                stride = (2, 2) if j == 0 else (1, 1)
                x = BasicBlock(w, stride, dtype=d,
                               name=f"layer{i + 1}_{j}")(x, train)
            feats.append(x)
        c1, c2, c3, c4 = feats  # strides 8, 16, 32, 64

        def deconv(x, name):
            x = nn.ConvTranspose(256, (4, 4), strides=(2, 2), use_bias=False,
                                 dtype=d, name=f"{name}_up")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=d, name=f"{name}_bn")(x)
            return jax.nn.relu(x)

        a3 = nn.Conv(256, (1, 1), use_bias=False, dtype=d, name="adaption3")(c3)
        a2 = nn.Conv(256, (1, 1), use_bias=False, dtype=d, name="adaption2")(c2)
        a1 = nn.Conv(256, (1, 1), use_bias=False, dtype=d, name="adaption1")(c1)
        a0 = nn.Conv(256, (1, 1), use_bias=False, dtype=d, name="adaption0")(c0)

        u = deconv(c4, "deconv1") + a3           # stride 32
        u = deconv(u, "deconv2") + a2            # stride 16
        u = deconv(u, "deconv3") + a1            # stride 8
        u = deconv(u, "deconv4") + a0            # stride 4
        u = nn.Conv(256, (1, 1), use_bias=False, dtype=d, name="adaptionU1")(u)
        return CenterHeads(64, cfg.hidden_size, dtype=d, name="heads")(u)


def build_detector(config: LoreConfig):
    if config.backbone == "dla34":
        return DLASegDetector(config)
    return ResNetDetector(config)
