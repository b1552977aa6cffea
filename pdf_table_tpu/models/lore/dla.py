"""DLA-34 backbone + deformable-conv upsampling (DLAUp/IDAUp) in flax.

Reference: model/lore/lore_dla_34.py (dla34 topology levels [1,1,1,2,2,1],
channels [16,32,64,128,256,512]; DeformConv:65, IDAUp:86, DLAUp:114,
DLASeg:140). The deformable conv runs through ops.deform_conv2d (gather +
MXU matmul formulation of the reference's CUDA im2col kernel).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.deform_conv import deform_conv2d
from ..layers import BasicBlock, ConvBNAct

DLA34_LEVELS = (1, 1, 1, 2, 2, 1)
DLA34_CHANNELS = (16, 32, 64, 128, 256, 512)


class Root(nn.Module):
    """Aggregation node: concat children -> 1x1 conv -> bn -> (+residual) relu."""

    features: int
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children: Sequence[jax.Array], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn")(x)
        if self.residual:
            x = x + children[0]
        return jax.nn.relu(x)


class DlaBasicBlock(nn.Module):
    """DLA residual block: the residual is SUPPLIED by the caller
    (maxpool+project in Tree), unlike torchvision's internal shortcut
    (reference BasicBlock, center_net/modeling_centernet.py:220)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual, train: bool = False):
        y = ConvBNAct(self.features, (3, 3), (self.stride, self.stride),
                      act="relu", dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNAct(self.features, (3, 3), act=None,
                      dtype=self.dtype, name="conv2")(y, train)
        return jax.nn.relu(y + residual)


class Tree(nn.Module):
    """Recursive aggregation tree (reference Tree,
    center_net/modeling_centernet.py: maxpool downsample + 1x1 conv+bn
    ``project`` form the block residual; children accumulate into Root)."""

    levels: int
    features: int
    stride: int = 1
    level_root: bool = False
    root_residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        children = list(children) if children else []
        if self.stride > 1:
            bottom = nn.max_pool(x, (self.stride, self.stride),
                                 strides=(self.stride, self.stride),
                                 padding="VALID")
        else:
            bottom = x
        # NOTE: like the reference (Tree.forward, modeling_centernet.py:258),
        # any residual passed by a parent tree is ignored — the residual is
        # always recomputed from project(bottom).
        if bottom.shape[-1] != self.features:
            residual = ConvBNAct(self.features, (1, 1), act=None,
                                 dtype=self.dtype,
                                 name="project")(bottom, train)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = DlaBasicBlock(self.features, self.stride, dtype=self.dtype,
                               name="tree1")(x, residual, train)
            x2 = DlaBasicBlock(self.features, 1, dtype=self.dtype,
                               name="tree2")(x1, x1, train)
            out = Root(self.features, self.root_residual, dtype=self.dtype,
                       name="root")([x2, x1] + children, train)
        else:
            x1 = Tree(self.levels - 1, self.features, self.stride,
                      root_residual=self.root_residual, dtype=self.dtype,
                      name="tree1")(x, residual=residual, train=train)
            out = Tree(self.levels - 1, self.features, 1,
                       root_residual=self.root_residual, dtype=self.dtype,
                       name="tree2")(x1, children=children + [x1], train=train)
        return out


class DLA34(nn.Module):
    """Returns all 6 levels (strides 1, 2, 4, 8, 16, 32)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        ch = DLA34_CHANNELS
        y: List[jax.Array] = []
        x = ConvBNAct(ch[0], (7, 7), act="relu", dtype=d,
                      name="base")(x, train)
        x = ConvBNAct(ch[0], (3, 3), act="relu", dtype=d,
                      name="level0")(x, train)
        y.append(x)
        x = ConvBNAct(ch[1], (3, 3), (2, 2), act="relu", dtype=d,
                      name="level1")(x, train)
        y.append(x)
        x = Tree(1, ch[2], 2, level_root=False, dtype=d,
                 name="level2")(x, train=train)
        y.append(x)
        x = Tree(2, ch[3], 2, level_root=True, dtype=d,
                 name="level3")(x, train=train)
        y.append(x)
        x = Tree(2, ch[4], 2, level_root=True, dtype=d,
                 name="level4")(x, train=train)
        y.append(x)
        x = Tree(1, ch[5], 2, level_root=True, dtype=d,
                 name="level5")(x, train=train)
        y.append(x)
        return y


class DeformConvBlock(nn.Module):
    """offset/mask conv + modulated deform conv + bn + relu
    (reference DeformConv, lore_dla_34.py:65)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        om = nn.Conv(27, (3, 3), dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     name="conv_offset_mask")(x)
        offset = om[..., :18]
        mask = jax.nn.sigmoid(om[..., 18:])
        weight = self.param("weight", nn.initializers.he_normal(),
                            (3, 3, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = deform_conv2d(x, offset, mask, weight, bias)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn")(y.astype(self.dtype))
        return jax.nn.relu(y)


def _bilinear_upsample(x, factor: int):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c),
                            method="bilinear")


def bilinear_up_kernel(f: int) -> "jnp.ndarray":
    """Torch fill_up_weights init (lore_dla_34.py:53): (2f, 2f) bilinear
    tap weights for a stride-f depthwise transposed conv."""
    k = 2 * f
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    i = jnp.arange(k, dtype=jnp.float32)
    w1 = 1.0 - jnp.abs(i / f - c)
    return w1[:, None] * w1[None, :]


class DepthwiseUpsample(nn.Module):
    """Learnable grouped ConvTranspose(k=2f, stride=f, pad=f//2, groups=C)
    — the reference IDAUp 'up' op (lore_dla_34.py:96-99), bilinear-
    initialized. Expressed as an lhs-dilated depthwise conv (XLA-native;
    flax ConvTranspose lacks groups)."""

    factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        if f == 1:
            return x
        C = x.shape[-1]
        k = 2 * f

        def init(key, shape, dtype=jnp.float32):
            base = bilinear_up_kernel(f).astype(dtype)
            return jnp.broadcast_to(base[:, :, None, None], shape)

        kern = self.param("kernel", init, (k, k, 1, C))
        # ConvTranspose(stride f, pad f//2) == lhs-dilated conv with the
        # flipped kernel and per-side padding 2f - 1 - f//2. Runs in the
        # model compute dtype (depthwise convs are VPU/HBM-bound; f32
        # doubled the traffic for no accuracy the following bf16 DCN
        # could see).
        pad = 2 * f - 1 - f // 2
        cd = jnp.promote_types(self.dtype, x.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(cd),
            jnp.flip(kern, (0, 1)).astype(cd),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        return y.astype(self.dtype)


class IDAUp(nn.Module):
    """Iterative deep aggregation (reference IDAUp, lore_dla_34.py:86).

    Call with a list of feature maps; modifies entries startp+1..endp-1:
    each coarser level is deform-projected to ``features``, upsampled by
    its factor relative to the previous level, summed with the running
    merge, and node-deform-conv'd. Returns the updated list."""

    features: int
    up_factors: Tuple[int, ...]      # per level i-startp, factor vs level i-1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jax.Array], startp: int, endp: int,
                 train: bool = False):
        out = list(layers)
        for i in range(startp + 1, endp):
            k = i - startp
            x = DeformConvBlock(self.features, dtype=self.dtype,
                                name=f"proj_{k}")(out[i], train)
            x = DepthwiseUpsample(int(self.up_factors[k]), dtype=self.dtype,
                                  name=f"up_{k}")(x)
            x = DeformConvBlock(self.features, dtype=self.dtype,
                                name=f"node_{k}")(x + out[i - 1], train)
            out[i] = x
        return out


class DLAUp(nn.Module):
    """Pyramid of IDAUps collapsing levels to the first level's stride
    (reference DLAUp, lore_dla_34.py:114). Input: levels[first_level:]
    (channels e.g. (64, 128, 256, 512) at strides 4/8/16/32).
    Returns outs with outs[i] = merged feature at stride 4*2^i, channels[i]."""

    channels: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jax.Array], train: bool = False):
        n = len(layers)
        channels = list(self.channels)
        in_channels = list(self.channels)
        scales = [2 ** i for i in range(n)]
        work = list(layers)
        outs = [work[-1]]
        for i in range(n - 1):
            j = n - i - 2
            up_f = tuple(s // scales[j] for s in scales[j:])
            ida = IDAUp(channels[j], up_f, dtype=self.dtype, name=f"ida_{i}")
            work = ida(work, j, n, train=train)
            outs.insert(0, work[-1])
            scales[j + 1:] = [scales[j] for _ in scales[j + 1:]]
            in_channels[j + 1:] = [channels[j] for _ in in_channels[j + 1:]]
        return outs
