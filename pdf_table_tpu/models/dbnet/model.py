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


# The searched CompactDetBackbone plan (reference db_net/proxyless.py:113-131
# conv_op_ids decoded against its 20-op candidate list; SE slots carry an
# Identity shortcut there, i.e. x + SE(x)). Entries:
# (kind, kernels, expand, stride, out, residual)
DBNAS_PLAN = (
    ("rep", ((3, 3), (5, 5)), 2, (2, 2), 32, False),          # 35_RepConv2
    ("rep", ((1, 1), (3, 3), (5, 5)), 2, (1, 1), 32, True),   # 135_RepConv2
    ("rep", ((1, 1), (3, 3), (5, 5)), 2, (1, 1), 32, True),
    ("rep", ((1, 1), (3, 3), (5, 5)), 2, (1, 1), 32, True),
    ("rep", ((1, 1), (3, 3), (5, 5)), 2, (1, 1), 32, True),
    ("se", 2),                                                # SE_2
    ("rep", ((3, 3), (5, 5)), 4, (2, 2), 64, False),          # 35_RepConv4
    ("rep", ((3, 3), (5, 5)), 4, (1, 1), 64, True),
    ("rep", ((1, 1), (3, 3), (5, 5)), 4, (1, 1), 64, True),   # 135_RepConv4
    ("rep", ((1, 1), (3, 3), (5, 5)), 4, (1, 1), 64, True),
    ("rep", ((3, 3), (5, 5)), 4, (1, 1), 64, True),
    ("se", 8),                                                # SE_8
    ("rep", ((3, 3), (5, 5)), 4, (2, 2), 96, False),
    ("rep", ((1, 1), (3, 3), (5, 5)), 4, (1, 1), 96, True),
    ("rep", ((3, 3), (5, 5)), 4, (1, 1), 96, True),
    ("rep", ((1, 1), (3, 3), (5, 5)), 4, (1, 1), 96, True),
    ("rep", ((1, 1), (3, 3), (5, 5)), 4, (1, 1), 96, True),
    ("se", 8),
    ("mb",  ((5, 5),), 4, (2, 2), 128, False),                # 5x5_MBConv4
    ("rep", ((1, 1), (3, 3), (5, 5)), 4, (1, 1), 128, True),
    ("rep", ((1, 1), (3, 3), (5, 5)), 4, (1, 1), 128, True),
    ("rep", ((1, 1), (3, 3), (5, 5)), 4, (1, 1), 128, True),
    ("rep", ((3, 3), (5, 5)), 4, (1, 1), 128, True),
    ("se", 8),
)


class CompactNasBackbone(nn.Module):
    """The reference's searched proxyless det backbone, rebuilt exactly
    (DBNasModel -> CompactDetBackbone, db_net/dbnet.py:693-713 +
    proxyless.py:90-131): 3x3/2 ReLU stem to 32ch, then the DBNAS_PLAN
    block sequence; feature taps after each stage's SE slot (blocks 5, 11,
    17, 23 -> strides 4, 8, 16, 32)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..nas_layers import NasMBConv, NasMixConv, NasRepConv, NasSE

        d = self.dtype
        x = ConvBNAct(32, (3, 3), (2, 2), act="relu", dtype=d,
                      name="first_conv")(x, train)
        feats = []
        for i, spec in enumerate(DBNAS_PLAN):
            kind = spec[0]
            name = f"block{i}"
            if kind == "se":
                # det SE slots carry an Identity shortcut (proxyless.py:162)
                x = x + NasSE(spec[1], dtype=d, name=name)(x)
                feats.append(x)
                continue
            kind, kernels, expand, stride, out, residual = spec
            if kind == "mb":
                y = NasMBConv(out, kernels[0], expand, stride, dtype=d,
                              name=name)(x, train)
            elif kind == "mix":
                y = NasMixConv(out, kernels, expand, stride, dtype=d,
                               name=name)(x, train)
            else:
                y = NasRepConv(out, kernels, expand, stride, dtype=d,
                               name=name)(x, train)
            x = x + y if residual else y
        return tuple(feats)  # strides 4, 8, 16, 32


class DwPwConv(nn.Module):
    """depthwise k + bn + relu + pointwise 1x1 (reference DwPwConv,
    db_net/dbnet.py:35-72)."""

    features: int
    kernel: int
    bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        p = self.kernel // 2
        y = nn.Conv(c, (self.kernel, self.kernel),
                    padding=((p, p), (p, p)), feature_group_count=c,
                    use_bias=self.bias, dtype=self.dtype, name="depthwise")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(y)
        y = jax.nn.relu(y)
        return nn.Conv(self.features, (1, 1), use_bias=self.bias,
                       dtype=self.dtype, name="pointwise")(y)


class DwPwConvTranspose(nn.Module):
    """per-channel 2x2/2 transposed conv + bn + relu + pointwise
    (reference DwPwConvTranspose, dbnet.py:75-99). The grouped deconv with
    k = s = 2 is exactly 'each input pixel expands to a 2x2 block weighted
    by its channel kernel', expressed as a broadcast-multiply."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        w = self.param("depthwise_kernel", nn.initializers.he_normal(),
                       (2, 2, C))
        b = self.param("depthwise_bias", nn.initializers.zeros, (C,))
        y = (x[:, :, None, :, None, :]
             * w.astype(x.dtype)[None, None, :, None, :, :])
        y = y.reshape(B, H * 2, W * 2, C) + b.astype(x.dtype)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(y)
        y = jax.nn.relu(y)
        return nn.Conv(self.features, (1, 1), use_bias=True,
                       dtype=self.dtype, name="pointwise")(y)


class LightSegHead(nn.Module):
    """LightSegDetector binarize head (dbnet.py:376-386): DwPwConv k5 ->
    BN relu -> DwPwConvTranspose -> BN relu -> DwPwConvTranspose ->
    sigmoid."""

    inner: int
    dw_kernel: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.inner // 4
        d = self.dtype

        def bn(t, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                dtype=d, name=name)(t)

        x = DwPwConv(q, self.dw_kernel, dtype=d, name="dwpw")(x, train)
        x = jax.nn.relu(bn(x, "bn_a"))
        x = DwPwConvTranspose(q, dtype=d, name="up1")(x, train)
        x = jax.nn.relu(bn(x, "bn_b"))
        x = DwPwConvTranspose(1, dtype=d, name="up2")(x, train)
        return jax.nn.sigmoid(x.astype(jnp.float32))[..., 0]


class LightThreshHead(nn.Module):
    """LightSegDetector adaptive thresh head (_init_thresh, dbnet.py:403):
    plain conv k5 -> BN relu -> deconv2x -> BN relu -> deconv2x ->
    sigmoid."""

    inner: int
    dw_kernel: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.inner // 4
        d = self.dtype
        p = self.dw_kernel // 2
        x = nn.Conv(q, (self.dw_kernel, self.dw_kernel),
                    padding=((p, p), (p, p)), use_bias=False, dtype=d,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=d, name="bn_a")(x)
        x = jax.nn.relu(x)
        x = nn.ConvTranspose(q, (2, 2), strides=(2, 2), dtype=d,
                             name="up1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=d, name="bn_b")(x)
        x = jax.nn.relu(x)
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2), dtype=d,
                             name="up2")(x)
        return jax.nn.sigmoid(x.astype(jnp.float32))[..., 0]


class LightSegFuse(nn.Module):
    """LightSegDetector fusion (dbnet.py:366-373 + forward): per-level 1x1
    laterals, nearest-upsample to stride 4, SUM (not concat)."""

    inner: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        c2, c3, c4, c5 = feats
        d = self.dtype

        def up(t, r):
            b, h, w, c = t.shape
            t = jnp.broadcast_to(t[:, :, None, :, None, :],
                                 (b, h, r, w, r, c))
            return t.reshape(b, h * r, w * r, c)

        p5 = up(nn.Conv(self.inner, (1, 1), use_bias=False, dtype=d,
                        name="in5")(c5), 8)
        p4 = up(nn.Conv(self.inner, (1, 1), use_bias=False, dtype=d,
                        name="in4")(c4), 4)
        p3 = up(nn.Conv(self.inner, (1, 1), use_bias=False, dtype=d,
                        name="in3")(c3), 2)
        p2 = nn.Conv(self.inner, (1, 1), use_bias=False, dtype=d,
                     name="in2")(c2)
        return p5 + p4 + p3 + p2


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
        # call order mirrors the reference RSEFPN.forward exactly (in5..in2
        # then out5..out2): paddle2onnx initializer order follows graph
        # execution, so call-ordered ONNX shape matching lines up
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
            # DBNasModel: searched backbone + LightSegDetector sum-fusion
            # decoder with depthwise-separable heads (dbnet.py:693-713)
            feats = CompactNasBackbone(dtype=dtype, name="backbone")(x, train)
            fused = LightSegFuse(cfg.inner_channels, dtype=dtype,
                                 name="neck")(feats)
            prob = LightSegHead(cfg.inner_channels, dtype=dtype,
                                name="binarize")(fused, train)
            out = {"prob": prob.astype(jnp.float32)}
            if train:
                thr = LightThreshHead(cfg.inner_channels, dtype=dtype,
                                      name="thresh")(fused, train)
                out["thresh"] = thr.astype(jnp.float32)
                out["binary"] = jax.nn.sigmoid(
                    cfg.k * (out["prob"] - out["thresh"]))
            return out
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
