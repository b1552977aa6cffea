"""PicoDet in flax: LCNet backbone + CSP-PAN neck + shared GFL head.

Structure-exact re-expression of the reference torch network so reference
checkpoints convert 1:1 (convert/picodet_convert.py):
  * LCNet      — model/picodet/lcnet.py:159 (PPLCNet stages, feature maps
                 after blocks4/5/6 = strides 8/16/32).
  * CSPPAN     — model/picodet/csp_pan.py:233 (Channel_T 1x1s, top-down +
                 bottom-up CSPLayers of DarknetBottlenecks with DPModules,
                 extra stride-64 level = first_top_conv(c5) +
                 second_top_conv(pan_out3)).
  * PicoHead   — model/picodet/pico_head.py:966 with
                 share_cls_reg=True: per level ``num_convs`` x (depthwise
                 5x5 + pointwise 1x1, hardswish after each), one 1x1
                 ``head_cls`` whose channels split into class scores and
                 4*(reg_max+1) GFL bins (forward_eval :1108-1160).

Emits, per stride level, sigmoid class scores (B, HW, C) and raw GFL box
distributions (B, HW, 4*(reg_max+1)) — the export_post_process=False ONNX
contract the reference postprocessor consumes (processor_picodet.py:184).
TPU notes: NHWC, bf16-able via config.dtype, nearest 2x upsample is a
reshape-broadcast (XLA fuses), everything static-shaped.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import ConvBNAct, make_divisible, upsample2x
from .config import PicoDetConfig

# PPLCNet NET_CONFIG (k, in_c, out_c, stride, use_se) — lcnet.py:25
LCNET_CONFIG = {
    2: [(3, 16, 32, 1, False)],
    3: [(3, 32, 64, 2, False), (3, 64, 64, 1, False)],
    4: [(3, 64, 128, 2, False), (3, 128, 128, 1, False)],
    5: [(3, 128, 256, 2, False)] + [(5, 256, 256, 1, False)] * 5,
    6: [(5, 256, 512, 2, True), (5, 512, 512, 1, True)],
}


class LCNetDWSep(nn.Module):
    """dw_conv(+SE)+pw_conv, each conv+bn+hardswish (lcnet.py:93)."""

    features: int
    kernel: int
    stride: int
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        x = ConvBNAct(cin, (self.kernel, self.kernel),
                      (self.stride, self.stride), groups=cin, act="hardswish",
                      dtype=self.dtype, name="dw")(x, train)
        if self.use_se:
            s = jnp.mean(x, axis=(1, 2), keepdims=True)
            s = nn.Conv(cin // 4, (1, 1), use_bias=True, dtype=self.dtype,
                        name="se_fc1")(s)
            s = jax.nn.relu(s)
            s = nn.Conv(cin, (1, 1), use_bias=True, dtype=self.dtype,
                        name="se_fc2")(s)
            x = x * (jax.nn.relu6(s + 3.0) / 6.0)
        return ConvBNAct(self.features, (1, 1), act="hardswish",
                         dtype=self.dtype, name="pw")(x, train)


class LCNetBackbone(nn.Module):
    """PPLCNet trunk. Default returns blocks4/5/6 outputs (strides
    8/16/32, PicoDet feature_maps=[3,4,5]); SLANet uses blocks3..6
    (strides 4/8/16/32)."""

    scale: float = 1.0
    out_stages: Sequence[int] = (4, 5, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, s = self.dtype, self.scale
        x = ConvBNAct(make_divisible(16 * s), (3, 3), (2, 2), act="hardswish",
                      dtype=d, name="conv1")(x, train)
        outs = []
        for stage in range(2, 7):
            for i, (k, _, out_c, st, se) in enumerate(LCNET_CONFIG[stage]):
                x = LCNetDWSep(make_divisible(out_c * s), k, st, use_se=se,
                               dtype=d, name=f"blocks{stage}_{i}")(x, train)
            if stage in self.out_stages:
                outs.append(x)
        return tuple(outs)


class DPModule(nn.Module):
    """Depthwise 5x5 + pointwise 1x1, each bn+hardswish (csp_pan.py:57)."""

    features: int
    kernel: int = 5
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference dwconv maps in->out with groups=out; all in-tree uses
        # have in == out, i.e. a pure depthwise conv.
        x = ConvBNAct(self.features, (self.kernel, self.kernel),
                      (self.stride, self.stride), groups=self.features,
                      act="hardswish", dtype=self.dtype, name="dw")(x, train)
        return ConvBNAct(self.features, (1, 1), act="hardswish",
                         dtype=self.dtype, name="pw")(x, train)


class DarknetBottleneck(nn.Module):
    """1x1 ConvBN + DPModule; identity add disabled in CSPPAN use
    (csp_pan.py:107-159, add_identity=False)."""

    features: int
    kernel: int = 5
    add_identity: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNAct(self.features, (1, 1), act="hardswish",
                      dtype=self.dtype, name="conv1")(x, train)
        y = DPModule(self.features, self.kernel, dtype=self.dtype,
                     name="conv2")(y, train)
        if self.add_identity and x.shape[-1] == self.features:
            y = x + y
        return y


class CSPLayer(nn.Module):
    """main 1x1 -> bottlenecks; short 1x1; concat [main, short]; final 1x1
    (csp_pan.py:161-213, expand_ratio=0.5, num_blocks=1)."""

    features: int
    kernel: int = 5
    num_blocks: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 2
        short = ConvBNAct(mid, (1, 1), act="hardswish", dtype=self.dtype,
                          name="short_conv")(x, train)
        main = ConvBNAct(mid, (1, 1), act="hardswish", dtype=self.dtype,
                         name="main_conv")(x, train)
        for i in range(self.num_blocks):
            main = DarknetBottleneck(mid, self.kernel, dtype=self.dtype,
                                     name=f"block{i}")(main, train)
        y = jnp.concatenate([main, short], axis=-1)
        return ConvBNAct(self.features, (1, 1), act="hardswish",
                         dtype=self.dtype, name="final_conv")(y, train)


class CSPPAN(nn.Module):
    """n-level PAN, optionally adding one extra stride-2x top feature
    (csp_pan.py:233-346). PicoDet: 3 inputs + extra level; SLANet (the
    PaddleOCR table neck): 4 inputs, no extra level."""

    out_channels: int = 128
    kernel: int = 5
    extra_level: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        d, f = self.dtype, self.out_channels
        ins = [ConvBNAct(f, (1, 1), act="hardswish", dtype=d,
                         name=f"conv_t{i}")(x, train)
               for i, x in enumerate(feats)]
        n = len(ins)
        # top-down: concat order [upsampled_high, low] (csp_pan.py:322-327)
        inner = [ins[-1]]
        for idx in range(n - 1, 0, -1):
            up = upsample2x(inner[0])
            skip = ins[idx - 1]
            # SAME-padded stride-2 levels have ceil sizes, so 2x the upper
            # level can overshoot the skip by one row/col (e.g. SLANet 488:
            # 31 -> 16 -> up 32); crop to the skip's grid
            up = up[:, :skip.shape[1], :skip.shape[2]]
            inner.insert(0, CSPLayer(
                f, self.kernel, dtype=d,
                name=f"top_down{n - 1 - idx}")(
                    jnp.concatenate([up, skip], axis=-1), train))
        # bottom-up: concat order [downsampled_low, high] (:331-337)
        outs = [inner[0]]
        for idx in range(n - 1):
            down = DPModule(f, self.kernel, stride=2, dtype=d,
                            name=f"downsample{idx}")(outs[-1], train)
            outs.append(CSPLayer(
                f, self.kernel, dtype=d, name=f"bottom_up{idx}")(
                    jnp.concatenate([down, inner[idx + 1]], axis=-1), train))
        if self.extra_level:
            top = DPModule(f, self.kernel, stride=2, dtype=d,
                           name="first_top_conv")(ins[-1], train)
            top = top + DPModule(f, self.kernel, stride=2, dtype=d,
                                 name="second_top_conv")(outs[-1], train)
            outs.append(top)
        return tuple(outs)


class PicoHead(nn.Module):
    """Shared cls+reg head (pico_head.py:966, share_cls_reg=True): per
    level num_convs x (ConvNormLayer dw5 + ConvNormLayer pw1, hardswish
    after each — PicoFeat :56-168), then biased 1x1 head_cls."""

    num_classes: int
    reg_max: int = 7
    num_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        scores_out: List[jax.Array] = []
        boxes_out: List[jax.Array] = []
        reg_ch = 4 * (self.reg_max + 1)
        for li, x in enumerate(feats):
            f = x.shape[-1]
            for ci in range(self.num_convs):
                x = ConvBNAct(f, (5, 5), groups=f, act="hardswish",
                              dtype=self.dtype,
                              name=f"cls_conv_dw{li}_{ci}")(x, train)
                x = ConvBNAct(f, (1, 1), act="hardswish", dtype=self.dtype,
                              name=f"cls_conv_pw{li}_{ci}")(x, train)
            out = nn.Conv(self.num_classes + reg_ch, (1, 1), use_bias=True,
                          dtype=self.dtype, name=f"head_cls{li}")(x)
            cls, reg = out[..., :self.num_classes], out[..., self.num_classes:]
            b, h, w, _ = cls.shape
            scores_out.append(jax.nn.sigmoid(
                cls.reshape(b, h * w, self.num_classes).astype(jnp.float32)))
            boxes_out.append(
                reg.reshape(b, h * w, reg_ch).astype(jnp.float32))
        return scores_out, boxes_out


class PicoDet(nn.Module):
    config: PicoDetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        d = jnp.dtype(cfg.dtype)
        feats = LCNetBackbone(cfg.lcnet_scale, dtype=d,
                              name="backbone")(x, train)
        levels = CSPPAN(cfg.neck_channels,
                        extra_level=len(cfg.strides) == 4,
                        dtype=d, name="neck")(feats, train)
        scores, boxes = PicoHead(cfg.num_classes, cfg.reg_max, cfg.head_convs,
                                 dtype=d, name="head")(levels, train)
        return {"scores": scores, "boxes": boxes}
