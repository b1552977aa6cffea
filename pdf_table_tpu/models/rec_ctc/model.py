"""CTC text recognizers in flax (NHWC).

Three backbones behind one module:
  * crnn        — conv stack + BiLSTM + linear CTC head
                  (reference model/crnn/modeling_crnn.py:36).
  * svtr_lcnet  — PP-LCNet conv stages + SVTR global-mixer transformer
                  blocks + CTC head; the PP-OCRv4 rec architecture the
                  reference runs as ONNX (model/ocr_rec_pp/).
  * convnext_vit— ConvNext stem + ViT encoder + CTC
                  (model/convnext_vit/modeling_convnext_vit.py:20).

All emit logits (B, T, V) — time-major width positions. Decode is
ops.ctc.ctc_greedy_decode (vectorized XLA, no per-sequence Python loop).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import (ConvBNAct, DepthwiseSeparable, MLP,
                      TransformerEncoderLayer, sinusoid_positions)
from .config import RecConfig


class BiLSTM(nn.Module):
    """Bidirectional LSTM + output projection (reference
    BidirectionalLSTM, modeling_crnn.py:19: nn.LSTM(bidir) + embedding)."""

    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype,
                                          name="fwd_cell"))(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype,
                                          name="bwd_cell"),
                     reverse=True, keep_order=True)(x)
        y = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(self.out, dtype=self.dtype, name="embedding")(y)


class CRNNBackbone(nn.Module):
    """Exact reference conv stack (modeling_crnn.py:36-90):
    conv0(64)+p0(2,2) -> conv1(128)+p1(2,2) -> conv2(256,256)+p2(2,1) ->
    conv3(512,512)+p3(2,1) -> conv4(512, k=(2,1) s=(2,1)). Input H=32
    collapses to 1; RGB->gray happens inside like the reference."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        if x.shape[-1] == 3:
            x = (x[..., 0:1] * 0.2989 + x[..., 1:2] * 0.5870
                 + x[..., 2:3] * 0.1140)

        def conv(x, c, name, kernel=(3, 3), stride=(1, 1), padding="SAME"):
            return ConvBNAct(c, kernel, stride, act="relu", use_bias=True,
                             padding=padding, dtype=d, name=name)(x, train)

        def pool(x, kh, kw):
            return nn.max_pool(x, (kh, kw), strides=(kh, kw),
                               padding="VALID")

        x = pool(conv(x, 64, "conv0_0"), 2, 2)
        x = pool(conv(x, 128, "conv1_0"), 2, 2)
        x = conv(conv(x, 256, "conv2_0"), 256, "conv2_3")
        x = pool(x, 2, 1)
        x = conv(conv(x, 512, "conv3_0"), 512, "conv3_3")
        x = pool(x, 2, 1)
        x = conv(x, 512, "conv4_0", kernel=(2, 1), stride=(2, 1),
                 padding="VALID")
        return x[:, 0]  # (B, T, 512)


class SVTRLCNetBackbone(nn.Module):
    """PP-LCNet stages (H strides collapse to 1/16 -> avgpool) + SVTR
    global-mixer blocks over the width sequence."""

    dtype: Any = jnp.float32
    dims: int = 120
    depth: int = 2
    heads: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem: stride 2 both dims
        x = ConvBNAct(32, (3, 3), (2, 2), act="hardswish",
                      dtype=self.dtype, name="stem")(x, train)
        cfg = [  # (out, k, stride_hw, se)
            (64, 3, (1, 1), False),
            (128, 3, (2, 1), False),   # H/4, W/2
            (128, 3, (1, 1), False),
            (256, 3, (2, 1), False),   # H/8
            (256, 5, (1, 1), False),
            (512, 5, (2, 1), True),    # H/16
            (512, 5, (1, 1), True),
        ]
        for i, (c, k, st, se) in enumerate(cfg):
            x = DepthwiseSeparable(c, (k, k), st, use_se=se, act="hardswish",
                                   dtype=self.dtype, name=f"stage{i}")(x, train)
        # collapse H: (B, H', W', C) -> (B, W', C)
        x = jnp.mean(x, axis=1)
        x = nn.Dense(self.dims, dtype=self.dtype, name="proj")(x)
        T = x.shape[1]
        x = x + sinusoid_positions(T, self.dims, self.dtype)[None]
        for i in range(self.depth):
            x = TransformerEncoderLayer(self.dims, self.heads, mlp_ratio=2.0,
                                        prenorm=True, dtype=self.dtype,
                                        name=f"mixer{i}")(x)
        return x  # (B, T, dims)


class ConvNextViTBackbone(nn.Module):
    """ConvNext downsampling stem + ViT encoder over width patches
    (modeling_convnext.py:28 + modeling_vit.py:19)."""

    dtype: Any = jnp.float32
    dims: int = 192
    depth: int = 4
    heads: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="patchify")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln0")(x)
        for i, c in enumerate((128, 256)):
            # ConvNext block: dwconv7 + ln + mlp, then downsample H only
            y = nn.Conv(x.shape[-1], (7, 7), feature_group_count=x.shape[-1],
                        dtype=self.dtype, name=f"dw{i}")(x)
            y = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}a")(y)
            y = MLP(4 * x.shape[-1], x.shape[-1], dtype=self.dtype,
                    name=f"mlp{i}")(y)
            x = x + y
            x = nn.Conv(c, (2, 2), strides=(2, 1), dtype=self.dtype,
                        name=f"down{i}")(x)
        x = jnp.mean(x, axis=1)
        x = nn.Dense(self.dims, dtype=self.dtype, name="proj")(x)
        T = x.shape[1]
        # fixed-capacity positions sliced to T: the same params serve both
        # the full 804-px pass and the 300-px chunked pass
        max_len = max(T, 256)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, max_len, self.dims))
        x = x + pos[:, :T].astype(self.dtype)
        for i in range(self.depth):
            x = TransformerEncoderLayer(self.dims, self.heads, prenorm=True,
                                        dtype=self.dtype, name=f"vit{i}")(x)
        return x


class LightweightEdgeBackbone(nn.Module):
    """Mobile NAS-style recognizer backbone: depthwise-separable stages with
    mixed kernel sizes collapsing H (reference
    model/ocr_rec_lightweightedge/modeling_rec_lightweightedge.py:19 +
    nas_block/ — the searched architecture reduces to a sequence of
    inverted-residual blocks; this is the TPU re-expression, not a NAS
    run)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..layers import InvertedResidual

        d = self.dtype
        x = ConvBNAct(16, (3, 3), (2, 2), act="hardswish", dtype=d,
                      name="stem")(x, train)
        cfg = [  # (out, expand, kernel, stride_hw, se)
            (24, 48, 3, (2, 1), False),
            (24, 72, 3, (1, 1), False),
            (40, 96, 5, (2, 1), True),
            (40, 120, 5, (1, 1), True),
            (80, 240, 5, (2, 1), True),
            (96, 288, 5, (1, 1), True),
        ]
        for i, (c, e, k, st, se) in enumerate(cfg):
            x = InvertedResidual(c, e, (k, k), st, use_se=se, act="hardswish",
                                 dtype=d, name=f"block{i}")(x, train)
        x = jnp.mean(x, axis=1)               # collapse H
        return nn.Dense(192, dtype=d, name="proj")(x)


class CTCRecModel(nn.Module):
    config: RecConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        if cfg.backbone == "crnn":
            feat = CRNNBackbone(dtype=dtype, name="backbone")(x, train)
            feat = BiLSTM(cfg.hidden_size, cfg.hidden_size, dtype=dtype,
                          name="rnn1")(feat)
            feat = BiLSTM(cfg.hidden_size, 512, dtype=dtype,
                          name="rnn2")(feat)
        elif cfg.backbone == "svtr_lcnet":
            feat = SVTRLCNetBackbone(dtype=dtype, name="backbone")(x, train)
        elif cfg.backbone == "convnext_vit":
            feat = ConvNextViTBackbone(dtype=dtype, name="backbone")(x, train)
        elif cfg.backbone == "lightweight_edge":
            feat = LightweightEdgeBackbone(dtype=dtype, name="backbone")(x, train)
        else:
            raise ValueError(f"unknown rec backbone {cfg.backbone}")
        logits = nn.Dense(cfg.vocab_size, dtype=dtype, name="ctc_head")(feat)
        return logits.astype(jnp.float32)  # (B, T, V)
