"""Shared NAS layer zoo (flax) for the reference's proxyless-searched
backbones: the recognizer (model/ocr_rec_lightweightedge/nas_block/) and
the detector (model/db_net/proxyless.py + layers.py + mix_ops.py) both
compose these MobileInvertedResidual-style ops. Sub-module names mirror the
torch OrderedDict names so checkpoints convert layer-for-layer.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def nas_pad(k):
    return ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))


class ConvBNPReLU(nn.Module):
    """conv(+bn)(+PReLU) triplet with torch-matching sub-names; optional
    depthwise groups and explicit torch-style padding."""

    features: int
    kernel: Any
    stride: Any = (1, 1)
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, tuple(self.kernel), tuple(self.stride),
                    padding=nas_pad(self.kernel), feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        if self.act:
            x = nn.PReLU(negative_slope_init=0.25, name="act")(x)
        return x


def split_channels(total: int, n: int):
    """ceil split; last chunk absorbs the remainder (reference
    nas_block/layers.py split_layer)."""
    import math
    split = [math.ceil(total / n) for _ in range(n)]
    split[-1] += total - sum(split)
    return split


class NasMBConv(nn.Module):
    """MBInvertedConvLayer (nas_block/layers.py:94): optional 1x1 expand +
    depthwise k + 1x1 project (PReLU after expand/depthwise only)."""

    out: int
    kernel: Any
    expand: int
    stride: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = round(x.shape[-1] * self.expand)
        if self.expand != 1:
            x = ConvBNPReLU(mid, (1, 1), dtype=self.dtype,
                             name="inverted_bottleneck")(x, train)
        x = ConvBNPReLU(mid, self.kernel, self.stride, groups=mid,
                         dtype=self.dtype, name="depth_conv")(x, train)
        return ConvBNPReLU(self.out, (1, 1), act=False, dtype=self.dtype,
                            name="point_conv")(x, train)


class NasMixConv(nn.Module):
    """MBInvertedMixConvLayer (:265): expand, split channels over per-kernel
    depthwise branches, concat, project."""

    out: int
    kernels: Any
    expand: int
    stride: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = round(x.shape[-1] * self.expand)
        x = ConvBNPReLU(mid, (1, 1), dtype=self.dtype,
                         name="inverted_bottleneck")(x, train)
        splits = split_channels(mid, len(self.kernels))
        outs, o = [], 0
        for j, (k, c) in enumerate(zip(self.kernels, splits)):
            part = x[..., o:o + c]
            o += c
            outs.append(ConvBNPReLU(c, k, self.stride, groups=c,
                                     dtype=self.dtype,
                                     name=f"mix_conv_{j}")(part, train))
        x = jnp.concatenate(outs, axis=-1)
        return ConvBNPReLU(self.out, (1, 1), act=False, dtype=self.dtype,
                            name="point_conv")(x, train)


class NasLinMixConv(nn.Module):
    """LinearMixConvLayer (:401): NO expansion; every branch sees the full
    input; concat multiplies the channel count before the projection."""

    out: int
    kernels: Any
    stride: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        outs = [ConvBNPReLU(cin, k, self.stride, groups=cin,
                             dtype=self.dtype, name=f"mix_conv_{j}")(x, train)
                for j, k in enumerate(self.kernels)]
        x = jnp.concatenate(outs, axis=-1)
        x = nn.PReLU(negative_slope_init=0.25, name="act")(x)
        return ConvBNPReLU(self.out, (1, 1), act=False, dtype=self.dtype,
                            name="point_conv")(x, train)


class NasRepConv(nn.Module):
    """MBInvertedRepConvLayer (:575): expand, parallel depthwise branches
    (conv+bn, no act) SUMMED, shared PReLU, project."""

    out: int
    kernels: Any
    expand: int
    stride: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = round(x.shape[-1] * self.expand)
        x = ConvBNPReLU(mid, (1, 1), dtype=self.dtype,
                         name="inverted_bottleneck")(x, train)
        acc = None
        for j, k in enumerate(self.kernels):
            y = ConvBNPReLU(mid, k, self.stride, groups=mid, act=False,
                             dtype=self.dtype,
                             name=f"rep_conv_{j}")(x, train)
            acc = y if acc is None else acc + y
        acc = nn.PReLU(negative_slope_init=0.25, name="act")(acc)
        return ConvBNPReLU(self.out, (1, 1), act=False, dtype=self.dtype,
                            name="point_conv")(acc, train)


class NasSE(nn.Module):
    """SELayer (:517): mean-pool -> fc1 relu -> fc2 sigmoid -> scale."""

    squeeze: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(c // self.squeeze, (1, 1), dtype=self.dtype,
                    name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
