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

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import ConvBNAct, DepthwiseSeparable
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


# MobileNetV1Enhance block list: (filters1, filters2, stride_hw, dw_k, se).
# Channels scale by int(c*scale); the PP-OCRv3 rec backbone uses (2,1)
# strides to collapse height while keeping width, then a (1,2)-strided
# SE block and an avg pool (PaddleOCR rec_mv1_enhance, exported as the
# ONNX graph the reference downloads — model/ocr_rec_pp/).
MV1_ENHANCE_CFG = [
    (32, 64, (1, 1), 3, False),
    (64, 128, (1, 1), 3, False),
    (128, 128, (1, 1), 3, False),
    (128, 256, (2, 1), 3, False),
    (256, 256, (1, 1), 3, False),
    (256, 512, (2, 1), 3, False),
    (512, 512, (1, 1), 3, False),
    (512, 512, (1, 1), 3, False),
    (512, 512, (1, 1), 3, False),
    (512, 512, (1, 1), 3, False),
    (512, 512, (1, 1), 3, False),
    (512, 1024, (2, 1), 5, False),
    (1024, 1024, (1, 2), 5, True),
]


class SVTRBlock(nn.Module):
    """SVTR global-mixer block: pre-LN MHA (qkv fused, biased) + pre-LN
    2x-MLP with swish; LN eps 1e-5."""

    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        B, T, D = x.shape
        Dh = D // self.heads
        y = nn.LayerNorm(epsilon=1e-5, dtype=d, name="norm1")(x)
        qkv = nn.Dense(3 * D, dtype=d, name="qkv")(y)
        q, k, v = [t.reshape(B, T, self.heads, Dh)
                   for t in jnp.split(qkv, 3, axis=-1)]
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (Dh ** -0.5)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(att.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, T, D)
        x = x + nn.Dense(D, dtype=d, name="proj")(ctx)
        y = nn.LayerNorm(epsilon=1e-5, dtype=d, name="norm2")(x)
        y = nn.Dense(2 * D, dtype=d, name="fc1")(y)
        y = jax.nn.silu(y)
        return x + nn.Dense(D, dtype=d, name="fc2")(y)


class SVTRLCNetBackbone(nn.Module):
    """PP-OCRv3 rec backbone+neck: MobileNetV1Enhance (scale 0.5,
    last_conv_stride (1,2), avg last pool) then EncoderWithSVTR (conv1 3x3
    -> conv2 1x1 -> 2 global SVTR blocks -> LN -> conv3 1x1, concat with
    the shortcut, conv4 3x3 -> conv1x1 to ``dims``; all convs bn+swish)."""

    scale: float = 0.5
    dims: int = 64
    hidden: int = 120
    depth: int = 2
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBNAct(int(32 * self.scale), (3, 3), (2, 2), act="hardswish",
                      dtype=d, name="conv1")(x, train)
        for i, (_, f2, st, k, se) in enumerate(MV1_ENHANCE_CFG):
            x = DepthwiseSeparable(int(f2 * self.scale), (k, k), st,
                                   use_se=se, act="hardswish", dtype=d,
                                   name=f"block{i}")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="VALID")

        # EncoderWithSVTR (use_guide=False): shortcut = pooled feature
        h = x
        cin = x.shape[-1]
        z = ConvBNAct(cin // 8, (3, 3), act="swish", dtype=d,
                      name="svtr_conv1")(x, train)
        z = ConvBNAct(self.hidden, (1, 1), act="swish", dtype=d,
                      name="svtr_conv2")(z, train)
        B, H, W, C = z.shape
        z = z.reshape(B, H * W, C)
        for i in range(self.depth):
            z = SVTRBlock(self.hidden, self.heads, dtype=d,
                          name=f"svtr_block{i}")(z)
        z = nn.LayerNorm(epsilon=1e-6, dtype=d, name="svtr_norm")(z)
        z = z.reshape(B, H, W, C)
        z = ConvBNAct(cin, (1, 1), act="swish", dtype=d,
                      name="svtr_conv3")(z, train)
        z = jnp.concatenate([h, z], axis=-1)
        z = ConvBNAct(cin // 8, (3, 3), act="swish", dtype=d,
                      name="svtr_conv4")(z, train)
        z = ConvBNAct(self.dims, (1, 1), act="swish", dtype=d,
                      name="svtr_conv1x1")(z, train)
        # Im2Seq: H is 1 for the 48-px rec geometry; mean is exact there
        # and keeps other heights usable.
        return jnp.mean(z, axis=1)  # (B, W', dims)


class ConvNextBlock(nn.Module):
    """HF ConvNextLayer: dwconv7 -> LN -> pw 4x GELU pw -> layer_scale ->
    residual (modeling_convnext.py imports transformers ConvNextStage)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), feature_group_count=self.dim,
                    use_bias=True, dtype=self.dtype, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pw1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pw2")(y)
        gamma = self.param("gamma",
                           nn.initializers.constant(1e-6), (self.dim,))
        return x + gamma * y


class ConvNextViTBackbone(nn.Module):
    """ConvNext encoder + ViT over width tokens, the reference's exact
    structure (modeling_convnext_vit.py:20: ConvNextConfig depths [3,3,8,3]
    hidden [96,192,256,512] with the MODIFIED (2,1)-stride stage
    downsampling, then ViTForSTR hidden 192 / 3 heads / 12 layers over the
    (1, W/4) feature map; cls position embedding sliced off,
    modeling_vit.py:71). Luminance RGB->gray happens in-model
    (modeling_convnext_vit.py:57)."""

    dtype: Any = jnp.float32
    depths: Tuple[int, ...] = (3, 3, 8, 3)
    hidden_sizes: Tuple[int, ...] = (96, 192, 256, 512)
    dims: int = 192                 # ViT hidden
    depth: int = 12                 # ViT layers
    heads: int = 3
    pos_len: int = 75               # ckpt position rows (300px/4 chunk)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        if x.shape[-1] == 3:
            x = (x[..., 0:1] * 0.2989 + x[..., 1:2] * 0.5870
                 + x[..., 2:3] * 0.1140)
        # ConvNextEmbeddings: patchify conv k4 s4 + channel LN
        x = nn.Conv(self.hidden_sizes[0], (4, 4), strides=(4, 4),
                    padding="VALID", dtype=d, name="patch_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=d, name="patch_ln")(x)
        for si, (depth, c) in enumerate(zip(self.depths,
                                            self.hidden_sizes)):
            if si > 0:   # height-only downsample (2,1), width preserved
                x = nn.LayerNorm(epsilon=1e-6, dtype=d,
                                 name=f"s{si}_down_ln")(x)
                x = nn.Conv(c, (2, 1), strides=(2, 1), padding="VALID",
                            dtype=d, name=f"s{si}_down")(x)
            for li in range(depth):
                x = ConvNextBlock(c, dtype=d, name=f"s{si}_b{li}")(x)
        B, fh, fw, C = x.shape
        t = x.reshape(B, fh * fw, C)
        # ViT patch_embeddings: 1x1 conv == dense (patch_size=1)
        t = nn.Dense(self.dims, dtype=d, name="proj")(t)
        T = t.shape[1]
        # checkpoint positions after slicing off the cls row
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, max(T, self.pos_len), self.dims))
        t = t + pos[:, :T].astype(d)
        for i in range(self.depth):
            t = ViTLayer(self.dims, self.heads, dtype=d,
                         name=f"vit{i}")(t)
        return nn.LayerNorm(epsilon=1e-12, dtype=d, name="vit_ln")(t)


class ViTLayer(nn.Module):
    """HF ViTLayer: pre-LN self-attention + pre-LN MLP, biased linears,
    exact GELU, LN eps 1e-12."""

    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        B, T, D = x.shape
        Dh = D // self.heads
        y = nn.LayerNorm(epsilon=1e-12, dtype=d, name="ln1")(x)
        q = nn.Dense(D, dtype=d, name="q")(y).reshape(B, T, self.heads, Dh)
        k = nn.Dense(D, dtype=d, name="k")(y).reshape(B, T, self.heads, Dh)
        v = nn.Dense(D, dtype=d, name="v")(y).reshape(B, T, self.heads, Dh)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(Dh).astype(d)
        att = jax.nn.softmax(att, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, T, D)
        x = x + nn.Dense(D, dtype=d, name="attn_out")(ctx)
        y = nn.LayerNorm(epsilon=1e-12, dtype=d, name="ln2")(x)
        y = nn.Dense(4 * D, dtype=d, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        return x + nn.Dense(D, dtype=d, name="fc2")(y)


# NAS layer zoo shared with the proxyless det backbone
from ..nas_layers import (ConvBNPReLU as _ConvBNPReLU,
                          NasLinMixConv as _LinMixConv,
                          NasMBConv as _MBConv,
                          NasMixConv as _MixConv,
                          NasRepConv as _RepConv,
                          NasSE as _SE)


# The searched plnas_linear_mix_se architecture (reference nas_block/
# proxyless.py:116-137: conv_op_ids decoded against conv/se_candidates,
# with the img_height/height_flag kernel clamping traced through the four
# (5 cells + SE) stages). Zero ops pass through; entries:
# (kind, kernels, expand, stride, out, residual)
LWE_PLAN = (
    ("mb",  ((5, 5),), 6, (2, 2), 32, False),               # 5x5_MBConv6
    ("rep", ((3, 3), (5, 5)), 6, (1, 1), 32, True),         # 35_RepConv6
    ("rep", ((1, 1), (3, 3), (5, 5)), 2, (1, 1), 32, True), # 135_RepConv2
    ("rep", ((1, 1), (3, 3), (5, 5)), 6, (1, 1), 32, True), # 135_RepConv6
    ("mb",  ((5, 5),), 6, (1, 1), 32, True),                # 5x5_MBConv6
    ("se", 8),                                              # SE_8
    ("mix", ((3, 3), (5, 5)), 6, (2, 1), 64, False),        # 35_MixConv6
    ("zero",), ("zero",), ("zero",), ("zero",),
    ("se", 8),
    ("mb",  ((5, 5),), 2, (2, 1), 96, False),               # 5x5_MBConv2
    ("mb",  ((3, 5),), 6, (1, 1), 96, True),                # 5x5_MBConv6 h3
    ("linmix", ((3, 3), (3, 5)), None, (1, 1), 96, True),   # 35_LinMixConv
    ("mix", ((3, 3), (3, 5)), 4, (1, 1), 96, True),         # 35_MixConv4
    ("zero",),
    ("se", 8),
    ("mb",  ((3, 5),), 6, (2, 1), 128, False),              # 5x5_MBConv6 h3
    ("mb",  ((1, 5),), 6, (1, 1), 128, True),               # 5x5_MBConv6 h1
    ("rep", ((1, 3), (1, 5)), 4, (1, 1), 128, True),        # 35_RepConv4 h1
    ("mix", ((1, 3), (1, 5)), 4, (1, 1), 128, True),        # 35_MixConv4 h1
    ("zero",),
    # final SE slot decodes to Zero (conv_op_ids[23]=3)
)


class LightweightEdgeBackbone(nn.Module):
    """The reference's searched NAS recognizer backbone, rebuilt exactly
    (model/ocr_rec_lightweightedge/modeling_rec_lightweightedge.py:19 +
    nas_block/proxyless.py plnas_linear_mix_se): RGB->gray luma, 3x3/2
    stem to 24ch, then the LWE_PLAN block sequence; H collapses to 1 at
    input height 32 and the (B, W/4, 128) sequence feeds the CTC head
    (torch: Linear(128, 7644))."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        # RGB2GRAY (modeling_rec_lightweightedge.py:34-36)
        x = (x[..., 0:1] * 0.2989 + x[..., 1:2] * 0.5870
             + x[..., 2:3] * 0.1140)
        x = _ConvBNPReLU(24, (3, 3), (2, 2), dtype=d,
                         name="first_conv")(x, train)
        for i, spec in enumerate(LWE_PLAN):
            kind = spec[0]
            name = f"block{i}"
            if kind == "zero":
                continue
            if kind == "se":
                x = _SE(spec[1], dtype=d, name=name)(x)
                continue
            kind, kernels, expand, stride, out, residual = spec
            if kind == "mb":
                y = _MBConv(out, kernels[0], expand, stride, dtype=d,
                            name=name)(x, train)
            elif kind == "mix":
                y = _MixConv(out, kernels, expand, stride, dtype=d,
                             name=name)(x, train)
            elif kind == "linmix":
                y = _LinMixConv(out, kernels, stride, dtype=d,
                                name=name)(x, train)
            else:
                y = _RepConv(out, kernels, expand, stride, dtype=d,
                             name=name)(x, train)
            x = x + y if residual else y
        # (B, H=1, W', C) -> (B, W', C)
        return jnp.mean(x, axis=1)


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
            feat = SVTRLCNetBackbone(
                scale=cfg.svtr_scale, dims=cfg.svtr_dims,
                hidden=cfg.svtr_hidden, depth=cfg.svtr_depth,
                heads=cfg.svtr_heads, dtype=dtype, name="backbone")(x, train)
        elif cfg.backbone == "convnext_vit":
            feat = ConvNextViTBackbone(
                dtype=dtype, depths=tuple(cfg.convnext_depths),
                hidden_sizes=tuple(cfg.convnext_hidden), dims=cfg.vit_dim,
                depth=cfg.vit_layers, heads=cfg.vit_heads,
                pos_len=cfg.vit_pos_len, name="backbone")(x, train)
        elif cfg.backbone == "lightweight_edge":
            feat = LightweightEdgeBackbone(dtype=dtype, name="backbone")(x, train)
        else:
            raise ValueError(f"unknown rec backbone {cfg.backbone}")
        logits = nn.Dense(cfg.vocab_size, dtype=dtype, name="ctc_head")(feat)
        return logits.astype(jnp.float32)  # (B, T, V)
