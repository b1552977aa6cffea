"""SLANet in flax: PP-LCNet backbone + CSP-PAN neck + attention-GRU SLAHead.

Structure-exact re-expression of the PaddleOCR SLANet graph the reference
downloads as ONNX (model/slanet/configuration_slanet.py:64-65
``model_provider="PaddleOCR", predictor_type="onnx"``):

  backbone  PPLCNet scale 1.0 returning blocks3..6 (strides 4/8/16/32)
  neck      CSPPAN out 96 over the 4 levels (no extra level)
  head      SLAHead: attention-GRU decoder over the stride-32 feature,
            one-hot char encoding, 2-layer structure/loc generators
            (PaddleOCR table_att_head.py SLAHead + rec_att_head.py
            AttentionGRUCell).

TPU-native design: the autoregressive decode is one ``lax.scan`` over
``max_structure_len`` static steps — per step: additive attention of the
GRU hidden over the flattened visual memory, GRU update, structure logits
+ loc regression, greedy argmax feeding the next step. The whole model is
a single compiled program; weight conversion is
convert/slanet_convert.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..picodet.model import CSPPAN, LCNetBackbone
from .config import SLANetConfig
from .vocab import StructureVocab


class SLAHead(nn.Module):
    """Attention-GRU structure decoder (PaddleOCR SLAHead).

    Parameters mirror the paddle modules 1:1 for conversion:
      attention cell: i2h (C->H, no bias), h2h (H->H, bias),
                      score (H->1, no bias), GRUCell in=(C+V) gates (r,z,c)
      structure_generator: Linear(H,H) -> Linear(H,V)        (no act)
      loc_generator:       Linear(H,H) -> Linear(H,L) -> sigmoid
    """

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
        # submodule calls inside lax.scan leak tracers), and flat names
        # make paddle/torch weight conversion direct.
        init = nn.initializers.xavier_uniform()
        zeros = nn.initializers.zeros
        p = self.param
        w_i2h = p("attn_i2h", init, (C, hd))
        w_h2h = p("attn_h2h", init, (hd, hd))
        b_h2h = p("attn_h2h_b", zeros, (hd,))
        w_score = p("attn_score", init, (hd, 1))
        in_dim = C + V
        # creation order mirrors torch/Paddle GRUCell serialization
        # (weight_ih, weight_hh, bias_ih, bias_hh) so ordered ONNX shape
        # matching keeps the two same-shaped biases straight
        w_ih = p("gru_w_ih", init, (in_dim, 3 * hd))
        w_hh = p("gru_w_hh", init, (hd, 3 * hd))
        b_ih = p("gru_b_ih", zeros, (3 * hd,))
        b_hh = p("gru_b_hh", zeros, (3 * hd,))
        w_s0 = p("fc_struct0", init, (hd, hd))
        b_s0 = p("fc_struct0_b", zeros, (hd,))
        w_s1 = p("fc_struct1", init, (hd, V))
        b_s1 = p("fc_struct1_b", zeros, (V,))
        w_l0 = p("fc_loc0", init, (hd, hd))
        b_l0 = p("fc_loc0_b", zeros, (hd,))
        w_l1 = p("fc_loc1", init, (hd, L))
        b_l1 = p("fc_loc1_b", zeros, (L,))

        keys = mem @ w_i2h                       # (B, HW, hd) — precompute

        def step(carry, teacher_tok):
            hidden, tok = carry
            if teacher_tok is not None:
                tok = teacher_tok                # teacher forcing (training)
            q = (hidden @ w_h2h + b_h2h)[:, None, :]
            e = (jnp.tanh(keys + q) @ w_score)[..., 0]     # (B, HW)
            a = jax.nn.softmax(e, axis=-1)
            ctx = jnp.einsum("bl,blc->bc", a, mem)
            x = jnp.concatenate(
                [ctx, jax.nn.one_hot(tok, V, dtype=ctx.dtype)], axis=-1)
            gx = x @ w_ih + b_ih
            gh = hidden @ w_hh + b_hh
            xr, xz, xc = jnp.split(gx, 3, axis=-1)
            hr, hz, hc = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            c = jnp.tanh(xc + r * hc)
            new_hidden = z * hidden + (1 - z) * c
            logits = (new_hidden @ w_s0 + b_s0) @ w_s1 + b_s1
            loc = jax.nn.sigmoid((new_hidden @ w_l0 + b_l0) @ w_l1 + b_l1)
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
        feats = LCNetBackbone(cfg.lcnet_scale, out_stages=(3, 4, 5, 6),
                              dtype=d, name="backbone")(x, train)
        levels = CSPPAN(cfg.neck_channels, extra_level=False, dtype=d,
                        name="neck")(feats, train)
        probs, locs = SLAHead(vocab, cfg.hidden_size, cfg.loc_reg_num,
                              cfg.max_structure_len, dtype=d,
                              name="head")(levels[-1], train,
                                           teacher_tokens=teacher_tokens)
        return {"structure_probs": probs, "loc_preds": locs}
