"""SLANet in flax: PP-LCNet backbone + CSP fuse + attention-GRU SLA head.

Reference runs this as a PaddleOCR ONNX graph (model/slanet/
configuration_slanet.py:64-65). TPU-native design: the autoregressive
structure decoder is a single ``lax.scan`` over ``max_structure_len`` steps
(static shape) — per step: additive attention of the GRU hidden over visual
features -> GRU update -> structure logits + 8-dim location regression.
Greedy argmax feeds the next step's token embedding; everything stays in one
compiled program.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import ConvBNAct, DepthwiseSeparable
from .config import SLANetConfig
from .vocab import StructureVocab


class SLABackbone(nn.Module):
    """PP-LCNet-style feature extractor to stride 16 + global fuse."""

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBNAct(16, (3, 3), (2, 2), act="hardswish", dtype=d,
                      name="stem")(x, train)
        cfg = [(32, 3, 1, False), (64, 3, 2, False), (64, 3, 1, False),
               (128, 3, 2, False), (128, 3, 1, False),
               (256, 5, 2, True), (256, 5, 1, True)]
        for i, (c, k, s, se) in enumerate(cfg):
            x = DepthwiseSeparable(c, (k, k), (s, s), use_se=se,
                                   act="hardswish", dtype=d,
                                   name=f"b{i}")(x, train)
        x = nn.Conv(self.hidden, (1, 1), dtype=d, name="proj")(x)
        return x  # (B, H/16, W/16, hidden)


class SLAHead(nn.Module):
    """Attention-GRU structure decoder (PP-StructureV2 SLAHead)."""

    vocab_size: int
    hidden: int
    loc_reg_num: int
    max_len: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False, teacher_tokens=None):
        B, H, W, C = feat.shape
        mem = feat.reshape(B, H * W, C).astype(jnp.float32)
        hd, V, L = self.hidden, self.vocab_size, self.loc_reg_num

        # Explicit parameters: the scan body must stay module-free (flax
        # submodule calls inside lax.scan leak tracers), and flat param
        # names make torch/paddle weight conversion direct.
        init = nn.initializers.xavier_uniform()
        zeros = nn.initializers.zeros
        p = self.param
        embed_tbl = p("token_embed", nn.initializers.normal(0.02), (V, hd))
        w_q = p("attn_q", init, (hd, hd))
        w_k = p("attn_k", init, (C, hd))
        w_v = p("attn_v", init, (hd, 1))
        in_dim = hd + C
        w_ir = p("gru_ir", init, (in_dim, hd)); b_ir = p("gru_bir", zeros, (hd,))
        w_iz = p("gru_iz", init, (in_dim, hd)); b_iz = p("gru_biz", zeros, (hd,))
        w_in = p("gru_in", init, (in_dim, hd)); b_in = p("gru_bin", zeros, (hd,))
        w_hr = p("gru_hr", init, (hd, hd)); b_hr = p("gru_bhr", zeros, (hd,))
        w_hz = p("gru_hz", init, (hd, hd)); b_hz = p("gru_bhz", zeros, (hd,))
        w_hn = p("gru_hn", init, (hd, hd)); b_hn = p("gru_bhn", zeros, (hd,))
        w_struct = p("fc_struct", init, (hd, V))
        b_struct = p("fc_struct_b", zeros, (V,))
        w_loc1 = p("fc_loc1", init, (hd + C, hd))
        b_loc1 = p("fc_loc1_b", zeros, (hd,))
        w_loc2 = p("fc_loc2", init, (hd, L))
        b_loc2 = p("fc_loc2_b", zeros, (L,))

        keys = mem @ w_k                          # (B, HW, hd) — precompute

        def step(carry, teacher_tok):
            hidden, tok = carry
            if teacher_tok is not None:
                tok = teacher_tok                 # teacher forcing (training)
            q = (hidden @ w_q)[:, None, :]        # (B, 1, hd)
            e = (jnp.tanh(q + keys) @ w_v)[..., 0]    # (B, HW)
            a = jax.nn.softmax(e, axis=-1)
            ctx = jnp.einsum("bl,blc->bc", a, mem)
            x = jnp.concatenate([embed_tbl[tok], ctx], axis=-1)
            r = jax.nn.sigmoid(x @ w_ir + b_ir + hidden @ w_hr + b_hr)
            z = jax.nn.sigmoid(x @ w_iz + b_iz + hidden @ w_hz + b_hz)
            n = jnp.tanh(x @ w_in + b_in + r * (hidden @ w_hn + b_hn))
            new_hidden = (1 - z) * n + z * hidden
            logits = new_hidden @ w_struct + b_struct
            hc = jnp.concatenate([new_hidden, ctx], axis=-1)
            loc = jax.nn.sigmoid(jax.nn.relu(hc @ w_loc1 + b_loc1)
                                 @ w_loc2 + b_loc2)
            next_tok = jnp.argmax(logits, axis=-1)
            return (new_hidden, next_tok), (logits, loc)

        h0 = jnp.zeros((B, hd), jnp.float32)
        tok0 = jnp.zeros((B,), jnp.int32)  # sos
        if teacher_tokens is not None:
            # inputs = [sos, tok_0 .. tok_{T-2}] (shifted right)
            xs = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32),
                 teacher_tokens[:, :self.max_len - 1].astype(jnp.int32)],
                axis=1)
            (_, _), (logits, locs) = jax.lax.scan(
                lambda c, t: step(c, t), (h0, tok0),
                jnp.transpose(xs, (1, 0)))
        else:
            (_, _), (logits, locs) = jax.lax.scan(
                lambda c, _: step(c, None), (h0, tok0), None,
                length=self.max_len)
        # scan stacks on axis 0 -> (T, B, ...) -> (B, T, ...)
        return (jnp.transpose(jax.nn.softmax(logits, axis=-1), (1, 0, 2)),
                jnp.transpose(locs, (1, 0, 2)))


class SLANet(nn.Module):
    config: SLANetConfig

    @nn.compact
    def __call__(self, x, train: bool = False, teacher_tokens=None):
        """With ``teacher_tokens`` (B, T) the decoder consumes ground-truth
        tokens shifted right (teacher forcing) instead of its own argmax —
        the training mode; inference greedy-decodes."""
        cfg = self.config
        d = jnp.dtype(cfg.dtype)
        vocab = cfg.vocab_size or len(StructureVocab())
        feat = SLABackbone(cfg.hidden_size, dtype=d, name="backbone")(x, train)
        probs, locs = SLAHead(vocab, cfg.hidden_size, cfg.loc_reg_num,
                              cfg.max_structure_len, dtype=d,
                              name="head")(feat, train,
                                           teacher_tokens=teacher_tokens)
        return {"structure_probs": probs, "loc_preds": locs}
