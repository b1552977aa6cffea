"""LORE logical-location regressor: transformer + stacking regressor.

Reference: LoreProcessModel (model/lore/lore_processor.py:399) — Transformer
(input 256 -> hidden 256, 4 post-norm encoder layers, 8 heads -> 2-layer
relu decoder -> 4 logical coords), Stacker (:342 — logi MLP encoder concat
visual feature -> transformer), x/y position embeddings over quantized det
corner coords (max_fmp_size=256).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import TransformerEncoderLayer
from .config import LoreConfig


class AxisDecoder(nn.Module):
    """linear+relu+linear+relu head emitting 4 logical coords
    (reference Decoder, lore_processor.py:66-78; relu keeps axes >= 0)."""

    hidden: int
    out: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.relu(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return jax.nn.relu(x)


class AxisTransformer(nn.Module):
    """input proj -> N post-norm encoder layers -> axis decoder
    (reference Transformer, lore_processor.py:81)."""

    hidden: int
    layers: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="in_proj")(x)
        attn_mask = None
        if mask is not None:
            m = mask.astype(jnp.float32)
            attn_mask = (m[:, None, :, None] * m[:, None, None, :]) > 0
        for i in range(self.layers):
            x = TransformerEncoderLayer(self.hidden, self.heads,
                                        prenorm=False, dtype=self.dtype,
                                        name=f"layer{i}")(x, mask=attn_mask)
        return AxisDecoder(self.hidden, dtype=self.dtype, name="decoder")(x)


class Stacker(nn.Module):
    """Refines logical locations given visual features + first-pass axes
    (reference Stacker, lore_processor.py:342)."""

    hidden: int
    layers: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vis_feat, logi, mask=None):
        y = nn.Dense(self.hidden, dtype=self.dtype, name="enc1")(logi)
        y = jax.nn.relu(y)
        y = nn.Dense(self.hidden, dtype=self.dtype, name="enc2")(y)
        y = jax.nn.relu(y)
        x = jnp.concatenate([vis_feat, y], axis=-1)
        return AxisTransformer(self.hidden, self.layers, self.heads,
                               dtype=self.dtype, name="tsfm")(x, mask)


class LoreProcessor(nn.Module):
    """(features (B,K,256), dets (B,K,8) int in feature-map coords, mask)
    -> (logi, stacked_logi)."""

    config: LoreConfig

    @nn.compact
    def __call__(self, feat, dets=None, mask=None):
        cfg = self.config
        d = jnp.dtype(cfg.dtype)
        if cfg.wiz_2dpe and dets is not None:
            V = cfg.max_fmp_size
            ps = jnp.clip(dets.astype(jnp.int32), 0, V - 1)
            x_emb = nn.Embed(V, cfg.hidden_size, dtype=d, name="x_pos")
            y_emb = nn.Embed(V, cfg.hidden_size, dtype=d, name="y_pos")
            # left/upper/right/lower corner embeddings
            # dets layout: x1,y1,x2,y2,x3,y3,x4,y4
            feat = feat + x_emb(ps[..., 0]) + y_emb(ps[..., 1]) \
                + x_emb(ps[..., 2]) + y_emb(ps[..., 5])
        logi = AxisTransformer(cfg.hidden_size, cfg.tsfm_layers,
                               cfg.num_heads, dtype=d,
                               name="tsfm_axis")(feat, mask)
        stacked = None
        if cfg.wiz_stacking:
            stacked = Stacker(cfg.hidden_size, cfg.stacking_layers,
                              cfg.num_heads, dtype=d,
                              name="stacker")(feat, logi, mask)
        return logi, stacked
