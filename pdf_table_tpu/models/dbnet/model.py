"""DBNet in flax (NHWC, bf16-capable).

Differentiable-binarization text detector (arXiv 1911.08947). Re-designed
from the reference's torch modules (model/db_net/dbnet.py: ResNet:260,
SegDetector:488, DBModel:715) as a single flax module:

  backbone (ResNet-18/50 or MobileNetV3) -> FPN fuse at stride 4
  -> binarize head (conv + 2x transposed-conv upsamples) -> prob map (B,H,W)

Training mode additionally emits the threshold map and the approximate
binary map  b = 1/(1+exp(-k(p - t)))  (SegDetector.step_function:484).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import (ConvBNAct, FPN, InvertedResidual, ResNet,
                      SEModule, make_divisible, upsample2x)
from .config import DbNetConfig


class MobileNetV3Det(nn.Module):
    """MobileNetV3-large(0.5) detection backbone (PP-OCR det student).

    Returns feature maps at strides 4/8/16/32, mirroring the Paddle det
    backbone the reference runs via ONNX (db_pp). The PP-OCRv3 det student
    checkpoint is trained with ``disable_se=True`` (all SE blocks dropped)
    and ends with a 1x1 squeeze conv to make_divisible(960*scale) at
    stride 32."""

    scale: float = 0.5
    disable_se: bool = True
    dtype: Any = jnp.float32

    # (kernel, expand, out, use_se, act, stride)
    CFG = [
        (3, 16, 16, False, "relu", 1),
        (3, 64, 24, False, "relu", 2),
        (3, 72, 24, False, "relu", 1),    # C2 @ stride 4
        (5, 72, 40, True, "relu", 2),
        (5, 120, 40, True, "relu", 1),
        (5, 120, 40, True, "relu", 1),    # C3 @ stride 8
        (3, 240, 80, False, "hardswish", 2),
        (3, 200, 80, False, "hardswish", 1),
        (3, 184, 80, False, "hardswish", 1),
        (3, 184, 80, False, "hardswish", 1),
        (3, 480, 112, True, "hardswish", 1),
        (3, 672, 112, True, "hardswish", 1),  # C4 @ stride 16
        (5, 672, 160, True, "hardswish", 2),
        (5, 960, 160, True, "hardswish", 1),
        (5, 960, 160, True, "hardswish", 1),  # C5 @ stride 32
    ]

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.scale
        x = ConvBNAct(make_divisible(16 * s), (3, 3), (2, 2), act="hardswish",
                      dtype=self.dtype, name="stem")(x, train)
        feats = []
        stride_now = 2
        for i, (k, e, c, se, act, st) in enumerate(self.CFG):
            if st == 2 and stride_now >= 4:
                feats.append(x)
            stride_now *= st
            x = InvertedResidual(
                make_divisible(c * s), make_divisible(e * s), (k, k), (st, st),
                use_se=se and not self.disable_se, act=act, dtype=self.dtype,
                name=f"block{i}")(x, train)
        x = ConvBNAct(make_divisible(960 * s), (1, 1), act="hardswish",
                      dtype=self.dtype, name="last_conv")(x, train)
        feats.append(x)
        return tuple(feats)  # C2..C5


class CompactNasBackbone(nn.Module):
    """Compact mobile det backbone with NAS-style mixed-kernel inverted
    residuals, width stages (32, 64, 96, 128) (reference DBNasModel ->
    CompactDetBackbone, db_net/dbnet.py:693-713 + proxyless.py:90; the
    searched cell choices are re-expressed as a fixed stage list)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBNAct(32, (3, 3), (2, 2), act="relu6", dtype=d,
                      name="stem")(x, train)
        feats = []
        stages = [  # (out, blocks as (expand, kernel))
            (32, [(3, 3), (3, 5)]),
            (64, [(6, 5), (3, 3)]),
            (96, [(6, 5), (3, 5)]),
            (128, [(6, 7), (6, 5)]),
        ]
        for si, (c, blocks) in enumerate(stages):
            for bi, (e, k) in enumerate(blocks):
                stride = (2, 2) if bi == 0 else (1, 1)
                x = InvertedResidual(c, c * e, (k, k), stride,
                                     act="relu6", dtype=d,
                                     name=f"s{si}_b{bi}")(x, train)
            feats.append(x)
        return tuple(feats)  # strides 4, 8, 16, 32


class RSELayer(nn.Module):
    """Residual squeeze-excite conv (PP-OCRv3 RSE-FPN unit)."""

    features: int
    kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (self.kernel, self.kernel), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return y + SEModule(dtype=self.dtype, name="se")(y)


class RSEFPN(nn.Module):
    """RSE-FPN neck: per-level RSE 1x1 laterals + top-down adds +
    per-level RSE 3x3 smooth, concat at stride 4."""

    out_channels: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c2, c3, c4, c5 = feats
        f = self.out_channels
        p5 = RSELayer(f, 1, dtype=self.dtype, name="in5")(c5)
        p4 = RSELayer(f, 1, dtype=self.dtype, name="in4")(c4) + upsample2x(p5)
        p3 = RSELayer(f, 1, dtype=self.dtype, name="in3")(c3) + upsample2x(p4)
        p2 = RSELayer(f, 1, dtype=self.dtype, name="in2")(c2) + upsample2x(p3)
        q = f // 4
        o5 = RSELayer(q, 3, dtype=self.dtype, name="out5")(p5)
        o4 = RSELayer(q, 3, dtype=self.dtype, name="out4")(p4)
        o3 = RSELayer(q, 3, dtype=self.dtype, name="out3")(p3)
        o2 = RSELayer(q, 3, dtype=self.dtype, name="out2")(p2)

        def up(t, r):
            b, h, w, c = t.shape
            t = jnp.broadcast_to(t[:, :, None, :, None, :], (b, h, r, w, r, c))
            return t.reshape(b, h * r, w * r, c)

        # concat high->low (p5..p2): the PaddleOCR DB FPN fuse order, which
        # fixes the channel layout the head's first conv was trained on.
        return jnp.concatenate([up(o5, 8), up(o4, 4), up(o3, 2), o2], axis=-1)


class BinarizeHead(nn.Module):
    """conv3x3 + BN + relu -> deconv2x + BN + relu -> deconv2x -> sigmoid
    (SegDetector.binarize, dbnet.py:536-543). Output at input resolution."""

    inner: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.inner // 4
        x = ConvBNAct(q, (3, 3), act="relu", dtype=self.dtype,
                      name="conv")(x, train)
        x = nn.ConvTranspose(q, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="up1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(x)
        x = jax.nn.relu(x)
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="up2")(x)
        return jax.nn.sigmoid(x)[..., 0]  # (B, H, W)


class DBNet(nn.Module):
    """Full detector. __call__(images NHWC float) -> dict with
    'prob' (B, H, W); train=True adds 'thresh' and 'binary'."""

    config: DbNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        if cfg.backbone.startswith("resnet"):
            feats = ResNet(int(cfg.backbone[6:]), dtype=dtype,
                           name="backbone")(x, train)
            fused = FPN(cfg.inner_channels, dtype=dtype,
                        name="neck")(feats, train)
        elif cfg.backbone == "mobilenetv3":
            feats = MobileNetV3Det(dtype=dtype, name="backbone")(x, train)
            fused = RSEFPN(cfg.inner_channels, dtype=dtype,
                           name="neck")(feats, train)
        elif cfg.backbone == "proxylessnas":
            feats = CompactNasBackbone(dtype=dtype, name="backbone")(x, train)
            fused = FPN(cfg.inner_channels, dtype=dtype,
                        name="neck")(feats, train)
        else:
            raise ValueError(f"unknown backbone {cfg.backbone}")

        prob = BinarizeHead(cfg.inner_channels, dtype=dtype,
                            name="binarize")(fused, train)
        out = {"prob": prob.astype(jnp.float32)}
        if train:
            thr = BinarizeHead(cfg.inner_channels, dtype=dtype,
                               name="thresh")(fused, train)
            out["thresh"] = thr.astype(jnp.float32)
            out["binary"] = jax.nn.sigmoid(
                cfg.k * (out["prob"] - out["thresh"]))
        return out
