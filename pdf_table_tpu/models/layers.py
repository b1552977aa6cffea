"""Shared flax building blocks for the model zoo.

TPU-first conventions used by every model in this package:
  * NHWC layout everywhere (XLA's native conv layout on TPU; the reference
    is NCHW torch).
  * bf16 compute / f32 params via the ``dtype`` argument threaded through
    all modules (reference runs fp16 on CUDA, deploy_utils.py:227-240).
  * BatchNorm folded into inference mode (use_running_average=True) —
    models here are inference-first like the reference; trainable paths
    pass ``train=True``.

Reference architectures these blocks serve: PP-LCNet (cls/cls_pp_lcnet.py),
MobileNetV3 det backbone, ResNet (db_net/dbnet.py:260), DLA-34
(lore/lore_dla_34.py), CSP-PAN (picodet/csp_pan.py), SVTR/CRNN recognizers.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def hardswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hardsigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


ACTS: dict = {
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "hardswish": hardswish,
    "hswish": hardswish,
    "hardsigmoid": hardsigmoid,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    None: None,
    "none": None,
}


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNAct(nn.Module):
    """Conv2D + BatchNorm + activation. The universal unit of the zoo."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    groups: int = 1
    act: Optional[str] = "relu"
    padding: Any = "SAME"
    use_bias: bool = False
    dilation: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        padding = self.padding
        if padding == "SAME":
            # torch/paddle convention: symmetric k//2 padding. Identical to
            # XLA SAME at stride 1 (odd kernels) but differs for strided
            # convs, where XLA SAME pads asymmetrically — symmetric padding
            # keeps converted reference checkpoints numerically exact.
            kh, kw = self.kernel
            dh, dw = self.dilation
            padding = ((dh * (kh - 1) // 2, dh * (kh - 1) // 2),
                       (dw * (kw - 1) // 2, dw * (kw - 1) // 2))
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=padding, feature_group_count=self.groups,
                    kernel_dilation=self.dilation,
                    use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        fn = ACTS[self.act]
        return fn(x) if fn is not None else x


class SEModule(nn.Module):
    """Squeeze-excite block (PP-LCNet / MobileNetV3 style)."""

    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(max(1, c // self.reduction), (1, 1), use_bias=True,
                    dtype=self.dtype, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(s)
        return x * hardsigmoid(s)


class DepthwiseSeparable(nn.Module):
    """DW conv + optional SE + PW conv (PP-LCNet block, cls_pp_lcnet.py:74)."""

    features: int
    dw_kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    use_se: bool = False
    act: str = "hardswish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        x = ConvBNAct(c_in, self.dw_kernel, self.stride, groups=c_in,
                      act=self.act, dtype=self.dtype, name="dw")(x, train)
        if self.use_se:
            x = SEModule(dtype=self.dtype, name="se")(x)
        x = ConvBNAct(self.features, (1, 1), act=self.act,
                      dtype=self.dtype, name="pw")(x, train)
        return x


class InvertedResidual(nn.Module):
    """MobileNetV3 inverted-residual block."""

    features: int
    expand: int
    dw_kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    use_se: bool = False
    act: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        c_in = x.shape[-1]
        y = ConvBNAct(self.expand, (1, 1), act=self.act,
                      dtype=self.dtype, name="expand")(x, train)
        y = ConvBNAct(self.expand, self.dw_kernel, self.stride,
                      groups=self.expand, act=self.act,
                      dtype=self.dtype, name="dw")(y, train)
        if self.use_se:
            y = SEModule(dtype=self.dtype, name="se")(y)
        y = ConvBNAct(self.features, (1, 1), act=None,
                      dtype=self.dtype, name="project")(y, train)
        if self.stride == (1, 1) and c_in == self.features:
            y = y + inp
        return y


class BasicBlock(nn.Module):
    """ResNet-18/34 basic block (reference ResNet db_net/dbnet.py:200-260)."""

    features: int
    stride: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBNAct(self.features, (3, 3), self.stride, act="relu",
                      dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNAct(self.features, (3, 3), act=None,
                      dtype=self.dtype, name="conv2")(y, train)
        if self.stride != (1, 1) or x.shape[-1] != self.features:
            identity = ConvBNAct(self.features, (1, 1), self.stride, act=None,
                                 dtype=self.dtype, name="down")(x, train)
        return jax.nn.relu(y + identity)


class Bottleneck(nn.Module):
    """ResNet-50 bottleneck block."""

    features: int  # internal width; output = features * 4
    stride: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out_c = self.features * 4
        y = ConvBNAct(self.features, (1, 1), act="relu",
                      dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNAct(self.features, (3, 3), self.stride, act="relu",
                      dtype=self.dtype, name="conv2")(y, train)
        y = ConvBNAct(out_c, (1, 1), act=None,
                      dtype=self.dtype, name="conv3")(y, train)
        if self.stride != (1, 1) or x.shape[-1] != out_c:
            identity = ConvBNAct(out_c, (1, 1), self.stride, act=None,
                                 dtype=self.dtype, name="down")(x, train)
        return jax.nn.relu(y + identity)


class ResNet(nn.Module):
    """Multi-scale ResNet backbone returning C2..C5 feature maps.

    depths/block follow torchvision layouts: 18 -> BasicBlock [2,2,2,2],
    50 -> Bottleneck [3,4,6,3] (reference dbnet.py:260 `ResNet`).
    """

    depth: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.depth == 18:
            block, layers = BasicBlock, (2, 2, 2, 2)
        elif self.depth == 34:
            block, layers = BasicBlock, (3, 4, 6, 3)
        elif self.depth == 50:
            block, layers = Bottleneck, (3, 4, 6, 3)
        else:
            raise ValueError(f"unsupported resnet depth {self.depth}")

        x = ConvBNAct(64, (7, 7), (2, 2), act="relu",
                      dtype=self.dtype, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        feats = []
        widths = (64, 128, 256, 512)
        for i, (w, n) in enumerate(zip(widths, layers)):
            for j in range(n):
                stride = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = block(w, stride, dtype=self.dtype,
                          name=f"layer{i + 1}_{j}")(x, train)
            feats.append(x)
        return tuple(feats)  # strides 4, 8, 16, 32


def upsample2x(x):
    """Nearest 2x upsample, NHWC — XLA lowers this to an efficient broadcast."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def upsample_to(x, hw: Tuple[int, int]):
    """Nearest-neighbor resize to a static (H, W)."""
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method="nearest")


class FPN(nn.Module):
    """Top-down FPN over C2..C5 -> single fused map at stride 4
    (DBNet SegDetector neck, db_net/dbnet.py:488)."""

    out_features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        c2, c3, c4, c5 = feats
        f = self.out_features
        p5 = nn.Conv(f, (1, 1), use_bias=False, dtype=self.dtype, name="in5")(c5)
        p4 = nn.Conv(f, (1, 1), use_bias=False, dtype=self.dtype, name="in4")(c4) \
            + upsample2x(p5)
        p3 = nn.Conv(f, (1, 1), use_bias=False, dtype=self.dtype, name="in3")(c3) \
            + upsample2x(p4)
        p2 = nn.Conv(f, (1, 1), use_bias=False, dtype=self.dtype, name="in2")(c2) \
            + upsample2x(p3)
        q = f // 4
        o5 = nn.Conv(q, (3, 3), use_bias=False, dtype=self.dtype, name="out5")(p5)
        o4 = nn.Conv(q, (3, 3), use_bias=False, dtype=self.dtype, name="out4")(p4)
        o3 = nn.Conv(q, (3, 3), use_bias=False, dtype=self.dtype, name="out3")(p3)
        o2 = nn.Conv(q, (3, 3), use_bias=False, dtype=self.dtype, name="out2")(p2)
        hw = o2.shape[1:3]
        fused = jnp.concatenate([
            o2, upsample_to(o3, hw), upsample_to(o4, hw), upsample_to(o5, hw)],
            axis=-1)
        return fused  # (B, H/4, W/4, out_features)


class MLP(nn.Module):
    hidden: int
    out: int
    act: str = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = ACTS[self.act](x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class TransformerEncoderLayer(nn.Module):
    """Pre/post-norm transformer encoder layer (LORE processor, SVTR, Master
    decoders all reduce to this shape)."""

    dim: int
    heads: int
    mlp_ratio: float = 4.0
    prenorm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        def attn(y):
            return nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype,
                name="attn")(y, y, mask=mask)

        def ff(y):
            return MLP(int(self.dim * self.mlp_ratio), self.dim,
                       dtype=self.dtype, name="mlp")(y)

        if self.prenorm:
            x = x + attn(nn.LayerNorm(dtype=self.dtype, name="ln1")(x))
            x = x + ff(nn.LayerNorm(dtype=self.dtype, name="ln2")(x))
        else:
            x = nn.LayerNorm(dtype=self.dtype, name="ln1")(x + attn(x))
            x = nn.LayerNorm(dtype=self.dtype, name="ln2")(x + ff(x))
        return x


def sinusoid_positions(length: int, dim: int, dtype=jnp.float32) -> jax.Array:
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    i = jnp.arange(dim // 2, dtype=jnp.float32)[None, :]
    angle = pos / jnp.power(10000.0, 2.0 * i / dim)
    pe = jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)
    return pe.astype(dtype)
