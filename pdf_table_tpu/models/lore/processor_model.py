"""LORE logical-location regressor: transformer + stacking regressor.

Structured for checkpoint parity with the reference
(model/lore/lore_processor.py): pre-norm encoder layers (x + attn(norm(x)),
x + ff(norm(x))) with the reference's std-based Norm (:119-131, torch
unbiased std), q/k/v/out linear attention (:172), ReLU FeedForward with
d_ff=2048 (:229), 2-layer ReLU decoder (:66), Stacker with a 2-layer logi
encoder concatenated to visual features (:342), and x/y position embeddings
over quantized det corners (:399-430).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import LoreConfig


class RefNorm(nn.Module):
    """alpha * (x - mean) / (std + eps) + bias with UNBIASED std
    (reference Norm, lore_processor.py:119)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).sum(-1, keepdims=True) / (self.dim - 1)
        return alpha * (x - mu) / (jnp.sqrt(var) + self.eps) + bias


class RefMHA(nn.Module):
    """q/k/v/out linear multi-head attention (reference
    MultiHeadAttention, lore_processor.py:172)."""

    heads: int
    d_model: int

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        B, L, D = x.shape
        H = self.heads
        Dk = D // H
        q = nn.Dense(D, name="q_linear")(x).reshape(B, L, H, Dk)
        k = nn.Dense(D, name="k_linear")(x).reshape(B, L, H, Dk)
        v = nn.Dense(D, name="v_linear")(x).reshape(B, L, H, Dk)
        scores = jnp.einsum("blhd,bmhd->bhlm", q, k) / jnp.sqrt(Dk)
        if mask is not None:
            # mask (B, L) -> pairwise (reference attention():157-168)
            m2 = mask[:, None, :, None] * mask[:, None, None, :]
            scores = jnp.where(m2 > 0, scores, -6.55e4)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhlm,bmhd->blhd", attn, v).reshape(B, L, D)
        return nn.Dense(D, name="out")(out)


class RefEncoderLayer(nn.Module):
    """Pre-norm block (reference EncoderLayer, lore_processor.py:286)."""

    d_model: int
    heads: int
    d_ff: int = 2048

    @nn.compact
    def __call__(self, x, mask=None):
        y = RefNorm(self.d_model, name="norm_1")(x)
        x = x + RefMHA(self.heads, self.d_model, name="attn")(y, mask)
        y = RefNorm(self.d_model, name="norm_2")(x)
        h = jax.nn.relu(nn.Dense(self.d_ff, name="ff_linear_1")(y))
        x = x + nn.Dense(self.d_model, name="ff_linear_2")(h)
        return x


class AxisDecoder(nn.Module):
    """linear+relu+linear+relu emitting 4 logical coords (reference
    Decoder, lore_processor.py:66-78)."""

    hidden: int
    out: int = 4

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(nn.Dense(self.hidden, name="linear_0")(x))
        return jax.nn.relu(nn.Dense(self.out, name="linear_2")(x))


class AxisTransformer(nn.Module):
    """input linear -> N pre-norm encoder layers -> decoder (reference
    Transformer, lore_processor.py:81)."""

    hidden: int
    layers: int
    heads: int
    d_ff: int = 2048

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        x = nn.Dense(self.hidden, name="linear")(x)
        for i in range(self.layers):
            x = RefEncoderLayer(self.hidden, self.heads, self.d_ff,
                                name=f"layer_{i}")(x, mask)
        return AxisDecoder(self.hidden, name="decoder")(x)


class Stacker(nn.Module):
    """Refines logical locations given visual features + first-pass axes
    (reference Stacker, lore_processor.py:342)."""

    hidden: int
    layers: int
    heads: int
    d_ff: int = 2048

    @nn.compact
    def __call__(self, vis_feat, logi, mask=None):
        y = jax.nn.relu(nn.Dense(self.hidden, name="logi_encoder_0")(logi))
        y = jax.nn.relu(nn.Dense(self.hidden, name="logi_encoder_2")(y))
        x = jnp.concatenate([vis_feat, y], axis=-1)
        return AxisTransformer(self.hidden, self.layers, self.heads,
                               d_ff=self.d_ff, name="tsfm")(x, mask)


class LoreProcessor(nn.Module):
    """(features (B,K,H), dets (B,K,8) fmap coords, mask)
    -> (logi, stacked_logi)."""

    config: LoreConfig

    @nn.compact
    def __call__(self, feat, dets=None, mask=None):
        cfg = self.config
        if cfg.wiz_2dpe and dets is not None:
            V = cfg.max_fmp_size
            ps = jnp.clip(dets.astype(jnp.int32), 0, V - 1)
            x_emb = nn.Embed(V, cfg.hidden_size,
                             name="x_position_embeddings")
            y_emb = nn.Embed(V, cfg.hidden_size,
                             name="y_position_embeddings")
            # left/upper/right/lower (dets: x1,y1,x2,y2,x3,y3,x4,y4)
            feat = feat + x_emb(ps[..., 0]) + y_emb(ps[..., 1]) \
                + x_emb(ps[..., 2]) + y_emb(ps[..., 5])
        logi = AxisTransformer(cfg.hidden_size, cfg.tsfm_layers,
                               cfg.num_heads, d_ff=cfg.d_ff,
                               name="tsfm_axis")(feat, mask)
        stacked = None
        if cfg.wiz_stacking:
            stacked = Stacker(cfg.hidden_size, cfg.stacking_layers,
                              cfg.num_heads, d_ff=cfg.d_ff,
                              name="stacker")(feat, logi, mask)
        return logi, stacked
