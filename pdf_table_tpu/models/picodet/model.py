"""PicoDet in flax: PP-LCNet backbone + CSP-PAN neck + GFL head.

Reference architecture (run as ONNX there): model/picodet/lcnet.py:159,
csp_pan.py:233, pico_head.py:966. Emits, per stride level, sigmoid class
scores (B, HW, C) and GFL box distributions (B, HW, 4*(reg_max+1)) —
the exact tensor contract the reference postprocessor consumes
(processor_picodet.py:200-244), so decode logic is shared.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import ConvBNAct, DepthwiseSeparable, upsample2x
from .config import PicoDetConfig


class LCNetBackbone(nn.Module):
    """PP-LCNet 1.0x returning C3/C4/C5 (strides 8/16/32);
    reference picodet/lcnet.py:159."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBNAct(16, (3, 3), (2, 2), act="hardswish", dtype=d,
                      name="stem")(x, train)                       # s2
        x = DepthwiseSeparable(32, (3, 3), (1, 1), act="hardswish",
                               dtype=d, name="b2_0")(x, train)
        x = DepthwiseSeparable(64, (3, 3), (2, 2), act="hardswish",
                               dtype=d, name="b3_0")(x, train)     # s4
        x = DepthwiseSeparable(64, (3, 3), (1, 1), act="hardswish",
                               dtype=d, name="b3_1")(x, train)
        x = DepthwiseSeparable(128, (3, 3), (2, 2), act="hardswish",
                               dtype=d, name="b4_0")(x, train)     # s8
        x = DepthwiseSeparable(128, (3, 3), (1, 1), act="hardswish",
                               dtype=d, name="b4_1")(x, train)
        c3 = x
        x = DepthwiseSeparable(256, (3, 3), (2, 2), act="hardswish",
                               dtype=d, name="b5_0")(x, train)     # s16
        for i in range(5):
            x = DepthwiseSeparable(256, (5, 5), (1, 1), act="hardswish",
                                   dtype=d, name=f"b5_{i + 1}")(x, train)
        c4 = x
        x = DepthwiseSeparable(512, (5, 5), (2, 2), use_se=True,
                               act="hardswish", dtype=d, name="b6_0")(x, train)  # s32
        x = DepthwiseSeparable(512, (5, 5), (1, 1), use_se=True,
                               act="hardswish", dtype=d, name="b6_1")(x, train)
        c5 = x
        return c3, c4, c5


class CSPBlock(nn.Module):
    """Lightweight CSP fuse block (reference csp_pan.py CSPLayer)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        a = ConvBNAct(f // 2, (1, 1), act="hardswish", dtype=self.dtype,
                      name="short")(x, train)
        b = ConvBNAct(f // 2, (1, 1), act="hardswish", dtype=self.dtype,
                      name="main_in")(x, train)
        b = DepthwiseSeparable(f // 2, (5, 5), act="hardswish",
                               dtype=self.dtype, name="main_dw")(b, train)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBNAct(f, (1, 1), act="hardswish", dtype=self.dtype,
                         name="out")(y, train)


class CSPPAN(nn.Module):
    """CSP-PAN over C3/C4/C5 + extra stride-64 level
    (reference csp_pan.py:233)."""

    out_channels: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        d, f = self.dtype, self.out_channels
        c3, c4, c5 = feats
        p3 = ConvBNAct(f, (1, 1), act="hardswish", dtype=d, name="in3")(c3, train)
        p4 = ConvBNAct(f, (1, 1), act="hardswish", dtype=d, name="in4")(c4, train)
        p5 = ConvBNAct(f, (1, 1), act="hardswish", dtype=d, name="in5")(c5, train)
        # top-down
        t4 = CSPBlock(f, dtype=d, name="td4")(
            jnp.concatenate([p4, upsample2x(p5)], axis=-1), train)
        t3 = CSPBlock(f, dtype=d, name="td3")(
            jnp.concatenate([p3, upsample2x(t4)], axis=-1), train)
        # bottom-up
        b4 = CSPBlock(f, dtype=d, name="bu4")(
            jnp.concatenate([t4, DepthwiseSeparable(
                f, (5, 5), (2, 2), act="hardswish", dtype=d,
                name="down3")(t3, train)], axis=-1), train)
        b5 = CSPBlock(f, dtype=d, name="bu5")(
            jnp.concatenate([p5, DepthwiseSeparable(
                f, (5, 5), (2, 2), act="hardswish", dtype=d,
                name="down4")(b4, train)], axis=-1), train)
        # extra stride-64 level
        p6 = DepthwiseSeparable(f, (5, 5), (2, 2), act="hardswish", dtype=d,
                                name="extra")(b5, train)
        return t3, b4, b5, p6


class PicoHead(nn.Module):
    """Per-level shared-structure head: N depthwise-separable convs then
    1x1 cls and 1x1 GFL reg (reference pico_head.py:966)."""

    num_classes: int
    reg_max: int = 7
    n_convs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        scores_out: List[jax.Array] = []
        boxes_out: List[jax.Array] = []
        for li, x in enumerate(feats):
            f = x.shape[-1]
            for ci in range(self.n_convs):
                x = DepthwiseSeparable(f, (5, 5), act="hardswish",
                                       dtype=self.dtype,
                                       name=f"l{li}_conv{ci}")(x, train)
            cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                          name=f"l{li}_cls")(x)
            reg = nn.Conv(4 * (self.reg_max + 1), (1, 1), dtype=self.dtype,
                          name=f"l{li}_reg")(x)
            b, h, w, _ = cls.shape
            scores_out.append(jax.nn.sigmoid(
                cls.reshape(b, h * w, self.num_classes).astype(jnp.float32)))
            boxes_out.append(
                reg.reshape(b, h * w, 4 * (self.reg_max + 1)).astype(jnp.float32))
        return scores_out, boxes_out


class PicoDet(nn.Module):
    config: PicoDetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        d = jnp.dtype(cfg.dtype)
        feats = LCNetBackbone(dtype=d, name="backbone")(x, train)
        levels = CSPPAN(cfg.neck_channels, dtype=d, name="neck")(feats, train)
        scores, boxes = PicoHead(cfg.num_classes, cfg.reg_max, cfg.head_convs,
                                 dtype=d, name="head")(levels, train)
        return {"scores": scores, "boxes": boxes}
