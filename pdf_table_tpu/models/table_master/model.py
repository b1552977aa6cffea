"""TableMaster in flax: ResNet-extra encoder + Master transformer decoder
with KV-cache greedy decode in one lax.scan.

Reference: model/table/mtl_tabnet/table_master.py (TableMaster:592,
EncodeDecodeRecognizer:270), master_decoder.py, table_resnet_extra.py.
TPU redesign: instead of eager per-step re-encoding, the decoder keeps
per-layer K/V caches in the scan carry; each step projects only the new
token, appends to the caches (dynamic_update_slice), and attends over the
filled prefix. Cross-attention K/V over the visual memory are precomputed
once. Greedy argmax feeds the next step. Structure logits + per-step bbox
regression come out stacked (B, T, ...).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import BasicBlock, ConvBNAct, sinusoid_positions
from ..slanet.vocab import StructureVocab
from .config import TableMasterConfig


class TableResNetExtra(nn.Module):
    """Conv encoder to stride 16 (reference table_resnet_extra.py:318)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBNAct(64, (3, 3), act="relu", dtype=d, name="c1")(x, train)
        x = ConvBNAct(128, (3, 3), act="relu", dtype=d, name="c2")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = BasicBlock(256, dtype=d, name="b1")(x, train)
        x = ConvBNAct(256, (3, 3), act="relu", dtype=d, name="c3")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(2):
            x = BasicBlock(256, dtype=d, name=f"b2_{i}")(x, train)
        x = ConvBNAct(256, (3, 3), act="relu", dtype=d, name="c4")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(5):
            x = BasicBlock(512, dtype=d, name=f"b3_{i}")(x, train)
        x = ConvBNAct(512, (3, 3), act="relu", dtype=d, name="c5")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(3):
            x = BasicBlock(512, dtype=d, name=f"b4_{i}")(x, train)
        return ConvBNAct(512, (3, 3), act="relu", dtype=d,
                         name="c6")(x, train)  # stride 16


class TableMaster(nn.Module):
    config: TableMasterConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dt = jnp.dtype(cfg.dtype)
        V = cfg.vocab_size or len(StructureVocab())
        D, L, H = cfg.d_model, cfg.decoder_layers, cfg.heads
        Dh = D // H
        T = cfg.max_structure_len

        feat = TableResNetExtra(dtype=dt, name="encoder")(x, train)
        B, fh, fw, C = feat.shape
        mem = feat.reshape(B, fh * fw, C).astype(jnp.float32)
        mem = mem + sinusoid_positions(fh * fw, C)[None]
        if C != D:
            mem = nn.Dense(D, name="mem_proj")(mem)

        p = self.param
        init = nn.initializers.xavier_uniform()
        zeros = nn.initializers.zeros
        embed_tbl = p("token_embed", nn.initializers.normal(0.02), (V, D))
        pos_tbl = sinusoid_positions(T, D)

        layer_params = []
        for li in range(L):
            lp = {
                "q1": p(f"l{li}_q1", init, (D, D)),
                "k1": p(f"l{li}_k1", init, (D, D)),
                "v1": p(f"l{li}_v1", init, (D, D)),
                "o1": p(f"l{li}_o1", init, (D, D)),
                "q2": p(f"l{li}_q2", init, (D, D)),
                "o2": p(f"l{li}_o2", init, (D, D)),
                "ff1": p(f"l{li}_ff1", init, (D, cfg.ff_dim)),
                "ff1b": p(f"l{li}_ff1b", zeros, (cfg.ff_dim,)),
                "ff2": p(f"l{li}_ff2", init, (cfg.ff_dim, D)),
                "ff2b": p(f"l{li}_ff2b", zeros, (D,)),
                "ln1s": p(f"l{li}_ln1s", nn.initializers.ones, (D,)),
                "ln1b": p(f"l{li}_ln1b", zeros, (D,)),
                "ln2s": p(f"l{li}_ln2s", nn.initializers.ones, (D,)),
                "ln2b": p(f"l{li}_ln2b", zeros, (D,)),
                "ln3s": p(f"l{li}_ln3s", nn.initializers.ones, (D,)),
                "ln3b": p(f"l{li}_ln3b", zeros, (D,)),
            }
            # cross-attention K/V precomputed over memory
            mk = p(f"l{li}_k2", init, (D, D))
            mv = p(f"l{li}_v2", init, (D, D))
            lp["mem_k"] = (mem @ mk).reshape(B, -1, H, Dh)
            lp["mem_v"] = (mem @ mv).reshape(B, -1, H, Dh)
            layer_params.append(lp)

        w_cls = p("fc_cls", init, (D, V))
        b_cls = p("fc_cls_b", zeros, (V,))
        w_loc = p("fc_loc", init, (D, cfg.loc_reg_num))
        b_loc = p("fc_loc_b", zeros, (cfg.loc_reg_num,))

        def ln(x, s, b, eps=1e-6):
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + eps) * s + b

        def step(carry, t):
            tok, caches = carry
            h = embed_tbl[tok] + pos_tbl[t]            # (B, D)
            new_caches = []
            for li, lp in enumerate(layer_params):
                kc, vc = caches[li]                    # (B, T, H, Dh)
                y = ln(h, lp["ln1s"], lp["ln1b"])
                q = (y @ lp["q1"]).reshape(B, H, Dh)
                k_new = (y @ lp["k1"]).reshape(B, H, Dh)
                v_new = (y @ lp["v1"]).reshape(B, H, Dh)
                kc = jax.lax.dynamic_update_slice(kc, k_new[:, None],
                                                  (0, t, 0, 0))
                vc = jax.lax.dynamic_update_slice(vc, v_new[:, None],
                                                  (0, t, 0, 0))
                # self-attn over filled prefix [0, t]
                logits_att = jnp.einsum("bhd,bthd->bht", q, kc) / jnp.sqrt(Dh)
                pos_mask = (jnp.arange(T)[None, None, :] <= t)
                logits_att = jnp.where(pos_mask, logits_att, -1e9)
                a = jax.nn.softmax(logits_att, axis=-1)
                sa = jnp.einsum("bht,bthd->bhd", a, vc).reshape(B, D)
                h = h + sa @ lp["o1"]
                # cross-attn over memory
                y = ln(h, lp["ln2s"], lp["ln2b"])
                q2 = (y @ lp["q2"]).reshape(B, H, Dh)
                ca_logits = jnp.einsum("bhd,bshd->bhs", q2,
                                       lp["mem_k"]) / jnp.sqrt(Dh)
                ca = jax.nn.softmax(ca_logits, axis=-1)
                cv = jnp.einsum("bhs,bshd->bhd", ca,
                                lp["mem_v"]).reshape(B, D)
                h = h + cv @ lp["o2"]
                # ff
                y = ln(h, lp["ln3s"], lp["ln3b"])
                h = h + jax.nn.relu(y @ lp["ff1"] + lp["ff1b"]) \
                    @ lp["ff2"] + lp["ff2b"]
                new_caches.append((kc, vc))
            logits = h @ w_cls + b_cls
            loc = jax.nn.sigmoid(h @ w_loc + b_loc)
            next_tok = jnp.argmax(logits, axis=-1)
            return (next_tok, new_caches), (logits, loc)

        caches0 = [(jnp.zeros((B, T, H, Dh), jnp.float32),
                    jnp.zeros((B, T, H, Dh), jnp.float32))
                   for _ in range(L)]
        tok0 = jnp.zeros((B,), jnp.int32)
        (_, _), (logits, locs) = jax.lax.scan(
            step, (tok0, caches0), jnp.arange(T))
        return {"structure_probs":
                jnp.transpose(jax.nn.softmax(logits, -1), (1, 0, 2)),
                "loc_preds": jnp.transpose(locs, (1, 0, 2))}
