"""TableMaster / MtlTabNet in flax: TableResNetExtra encoder + Master
transformer decoder with KV-cache greedy decode in one lax.scan.

Reference: model/table/mtl_tabnet/ — encoder table_resnet_extra.py:205
(TableResNetExtra, layers=[1,2,5,3], GCB ContextBlock:38 on layers 2-4),
decoder master_decoder.py (TableMasterDecoder:532 = N-1 shared DecoderLayers
+ forked cls/bbox DecoderLayers sharing one final LayerNorm;
MtlTabNetDecoder:194 adds a cell-content branch), configs
table_master_config.py:27-66 / mtl_tabnet_config.py:50-82 (d_model 512,
heads 8, d_ff 2024, N=3, max_seq_len 500).

TPU redesign: instead of eager full-sequence re-decoding per emitted token
(reference greedy_forward re-runs decode_test on the growing prefix — O(T^2)
layer passes), the decoder keeps per-layer K/V caches in a lax.scan carry;
each step projects only the new token, appends via dynamic_update_slice,
and attends over the filled prefix. Cross-attention K/V over the visual
memory are precomputed once. Greedy argmax feeds the next step (or teacher
tokens when training). Structure logits + per-step bbox come out stacked.
Numerics match the reference layer-for-layer: pre-norm sublayers
(SubLayerConnection master_decoder.py:33), biased q/k/v/out linears
(MultiHeadAttention:75), embedding scaled by sqrt(d_model) (Embeddings:17),
interleaved sin/cos positions (PositionalEncoding:166), eps 1e-5.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import ConvBNAct
from .config import TableMasterConfig


def interleaved_positions(length: int, dim: int) -> jax.Array:
    """torch-convention PE: pe[:, 0::2]=sin, pe[:, 1::2]=cos
    (master_decoder.py:173-179)."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / dim))
    pe = jnp.zeros((length, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


class ContextBlock(nn.Module):
    """Global-context block, att pooling + channel_add fusion
    (table_resnet_extra.py:38; config headers=1, ratio=0.0625)."""

    ratio: float = 0.0625
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        planes = int(c * self.ratio)
        mask = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                       name="conv_mask")(x)                 # (B,H,W,1)
        attn = jax.nn.softmax(mask.reshape(b, h * w, 1), axis=1)
        ctx = jnp.einsum("bsc,bsk->bkc", x.reshape(b, h * w, c),
                         attn)[:, None]                     # (B,1,1,C)
        y = nn.Conv(planes, (1, 1), use_bias=True, dtype=self.dtype,
                    name="ca_conv1")(ctx)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ca_ln")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                    name="ca_conv2")(y)
        return x + y


class MasterBasicBlock(nn.Module):
    """BasicBlock with optional GCB after bn2 (table_resnet_extra.py:158)."""

    features: int
    gcb: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBNAct(self.features, (3, 3), act="relu", dtype=self.dtype,
                      name="conv1")(x, train)
        y = ConvBNAct(self.features, (3, 3), act=None, dtype=self.dtype,
                      name="conv2")(y, train)
        if self.gcb:
            y = ContextBlock(dtype=self.dtype, name="context")(y)
        if x.shape[-1] != self.features:
            identity = ConvBNAct(self.features, (1, 1), act=None,
                                 dtype=self.dtype, name="down")(x, train)
        return jax.nn.relu(y + identity)


class TableResNetExtra(nn.Module):
    """Stride-8 conv encoder (table_resnet_extra.py:205; layers=[1,2,5,3],
    gcb layers=[False,True,True,True])."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBNAct(64, (3, 3), act="relu", dtype=d, name="c1")(x, train)
        x = ConvBNAct(128, (3, 3), act="relu", dtype=d, name="c2")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = MasterBasicBlock(256, dtype=d, name="layer1_0")(x, train)
        x = ConvBNAct(256, (3, 3), act="relu", dtype=d, name="c3")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(2):
            x = MasterBasicBlock(256, gcb=True, dtype=d,
                                 name=f"layer2_{i}")(x, train)
        x = ConvBNAct(256, (3, 3), act="relu", dtype=d, name="c4")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(5):
            x = MasterBasicBlock(512, gcb=True, dtype=d,
                                 name=f"layer3_{i}")(x, train)
        x = ConvBNAct(512, (3, 3), act="relu", dtype=d, name="c5")(x, train)
        for i in range(3):
            x = MasterBasicBlock(512, gcb=True, dtype=d,
                                 name=f"layer4_{i}")(x, train)
        return ConvBNAct(512, (3, 3), act="relu", dtype=d,
                         name="c6")(x, train)  # stride 8


def _layer_norm(x, s, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * s + b


class TableMaster(nn.Module):
    config: TableMasterConfig

    def _decoder_layer_params(self, name: str, D: int, FF: int):
        """One DecoderLayer's weights (master_decoder.py:99): biased
        self-attn q/k/v/o, biased cross-attn q/k/v/o, FF, 3 pre-norms."""
        p = self.param
        init = nn.initializers.xavier_uniform()
        zeros = nn.initializers.zeros
        ones = nn.initializers.ones
        lp = {}
        for key, shape in (("q", (D, D)), ("k", (D, D)), ("v", (D, D)),
                           ("o", (D, D)), ("cq", (D, D)), ("ck", (D, D)),
                           ("cv", (D, D)), ("co", (D, D)),
                           ("ff1", (D, FF)), ("ff2", (FF, D))):
            lp[key] = p(f"{name}_{key}", init, shape)
            lp[key + "b"] = p(f"{name}_{key}b", zeros, (shape[1],))
        for i in (1, 2, 3):
            lp[f"ln{i}s"] = p(f"{name}_ln{i}s", ones, (D,))
            lp[f"ln{i}b"] = p(f"{name}_ln{i}b", zeros, (D,))
        return lp

    @nn.compact
    def __call__(self, x, train: bool = False,
                 teacher_tokens: Optional[jax.Array] = None,
                 decode_cells: bool = False):
        cfg = self.config
        dt = jnp.dtype(cfg.dtype)
        from .vocab import MasterStructureVocab
        V = cfg.vocab_size or len(MasterStructureVocab())
        D, H = cfg.d_model, cfg.heads
        Dh = D // H
        T = cfg.max_structure_len
        n_shared = cfg.decoder_layers - 1   # N-1 shared + cls + bbox forks

        feat = TableResNetExtra(dtype=dt, name="encoder")(x, train)
        B, fh, fw, C = feat.shape
        mem = feat.reshape(B, fh * fw, C).astype(jnp.float32)
        mem = mem + interleaved_positions(fh * fw, C)[None]
        if C != D:
            mem = nn.Dense(D, name="mem_proj")(mem)

        p = self.param
        init = nn.initializers.xavier_uniform()
        zeros = nn.initializers.zeros
        embed_tbl = p("token_embed", nn.initializers.normal(0.02), (V, D))
        pos_tbl = interleaved_positions(T + 1, D)

        names = [f"l{i}" for i in range(n_shared)] + ["cls", "bbox"]
        layers = []
        for name in names:
            lp = self._decoder_layer_params(name, D, cfg.ff_dim)
            # cross-attn K/V over memory precomputed once per forward
            lp["mem_k"] = (mem @ lp["ck"] + lp["ckb"]).reshape(B, -1, H, Dh)
            lp["mem_v"] = (mem @ lp["cv"] + lp["cvb"]).reshape(B, -1, H, Dh)
            layers.append(lp)
        shared, cls_lp, bbox_lp = layers[:n_shared], layers[-2], layers[-1]

        fns = p("fnorm_s", nn.initializers.ones, (D,))
        fnb = p("fnorm_b", zeros, (D,))
        w_cls = p("fc_cls", init, (D, V))
        b_cls = p("fc_cls_b", zeros, (V,))
        w_loc = p("fc_loc", init, (D, cfg.loc_reg_num))
        b_loc = p("fc_loc_b", zeros, (cfg.loc_reg_num,))

        scale = math.sqrt(D)
        # TableMasterConvertor (start_end_same=False, with_unknown=True):
        # ids = [dict..., unknown, start, end, pad] -> start = V - 3.
        vocab_sos = V - 3

        def layer_step(h, lp, kc, vc, t):
            """One token through one DecoderLayer (pre-norm residuals)."""
            y = _layer_norm(h, lp["ln1s"], lp["ln1b"])
            q = (y @ lp["q"] + lp["qb"]).reshape(B, H, Dh)
            k_new = (y @ lp["k"] + lp["kb"]).reshape(B, H, Dh)
            v_new = (y @ lp["v"] + lp["vb"]).reshape(B, H, Dh)
            kc = jax.lax.dynamic_update_slice(kc, k_new[:, None],
                                              (0, t, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, v_new[:, None],
                                              (0, t, 0, 0))
            att = jnp.einsum("bhd,bthd->bht", q, kc) / math.sqrt(Dh)
            att = jnp.where(jnp.arange(T)[None, None, :] <= t, att, -1e9)
            sa = jnp.einsum("bht,bthd->bhd", jax.nn.softmax(att, -1),
                            vc).reshape(B, D)
            h = h + sa @ lp["o"] + lp["ob"]
            y = _layer_norm(h, lp["ln2s"], lp["ln2b"])
            q2 = (y @ lp["cq"] + lp["cqb"]).reshape(B, H, Dh)
            ca = jnp.einsum("bhd,bshd->bhs", q2,
                            lp["mem_k"]) / math.sqrt(Dh)
            cv = jnp.einsum("bhs,bshd->bhd", jax.nn.softmax(ca, -1),
                            lp["mem_v"]).reshape(B, D)
            h = h + cv @ lp["co"] + lp["cob"]
            y = _layer_norm(h, lp["ln3s"], lp["ln3b"])
            h = h + (jax.nn.relu(y @ lp["ff1"] + lp["ff1b"])
                     @ lp["ff2"] + lp["ff2b"])
            return h, kc, vc

        teach = (jnp.concatenate(
            [jnp.full((B, 1), vocab_sos, jnp.int32),
             teacher_tokens[:, :-1].astype(jnp.int32)], axis=1)
            if teacher_tokens is not None else None)

        def step(carry, t):
            tok, caches = carry
            tok_in = teach[:, t] if teach is not None else tok
            h = jnp.take(embed_tbl, tok_in, axis=0) * scale + pos_tbl[t]
            new_caches = []
            for li, lp in enumerate(shared):
                kc, vc = caches[li]
                h, kc, vc = layer_step(h, lp, kc, vc, t)
                new_caches.append((kc, vc))
            ch, ckc, cvc = layer_step(h, cls_lp, *caches[n_shared], t)
            new_caches.append((ckc, cvc))
            bh, bkc, bvc = layer_step(h, bbox_lp, *caches[n_shared + 1], t)
            new_caches.append((bkc, bvc))
            logits = _layer_norm(ch, fns, fnb) @ w_cls + b_cls
            loc = jax.nn.sigmoid(_layer_norm(bh, fns, fnb) @ w_loc + b_loc)
            next_tok = jnp.argmax(logits, axis=-1)
            return (next_tok, new_caches), (logits, loc, h)

        caches0 = [(jnp.zeros((B, T, H, Dh), jnp.float32),
                    jnp.zeros((B, T, H, Dh), jnp.float32))
                   for _ in range(n_shared + 2)]
        tok0 = jnp.full((B,), vocab_sos, jnp.int32)
        (_, _), (logits, locs, hiddens) = jax.lax.scan(
            step, (tok0, caches0), jnp.arange(T))
        out = {"structure_probs":
               jnp.transpose(jax.nn.softmax(logits, -1), (1, 0, 2)),
               "loc_preds": jnp.transpose(locs, (1, 0, 2))}

        # -- MtlTabNet cell-content branch (MtlTabNetDecoder:194) ----------
        if cfg.variant == "mtl_tabnet" and cfg.cell_vocab_size:
            Vc = cfg.cell_vocab_size
            cell_lp = self._decoder_layer_params("cell", D, cfg.ff_dim)
            cell_lp["mem_k"] = (mem @ cell_lp["ck"]
                                + cell_lp["ckb"]).reshape(B, -1, H, Dh)
            cell_lp["mem_v"] = (mem @ cell_lp["cv"]
                                + cell_lp["cvb"]).reshape(B, -1, H, Dh)
            cell_embed = p("cell_embed", nn.initializers.normal(0.02),
                           (Vc, D))
            cin_w = p("cell_in", init, (2 * D, D))
            cin_b = p("cell_in_b", zeros, (D,))
            w_cell = p("fc_cell", init, (D, Vc))
            b_cell = p("fc_cell_b", zeros, (Vc,))
            if decode_cells and cfg.cell_slots:
                out.update(self._decode_cells(
                    jnp.transpose(hiddens, (1, 0, 2)),   # (B, T, D)
                    jnp.argmax(logits, -1).T,            # (B, T) emitted ids
                    cell_lp, cell_embed, cin_w, cin_b, w_cell, b_cell,
                    fns, fnb))
        return out

    def _decode_cells(self, hs, ids, lp, embed, cin_w, cin_b,
                      w_cell, b_cell, fns, fnb):
        """Greedy cell-content decode for K fixed td slots
        (MtlTabNetDecoder.decode_test:356-470, reference loops over cells
        eagerly; here all B*K cells decode in one KV-cache scan)."""
        cfg = self.config
        D, H = cfg.d_model, cfg.heads
        Dh = D // H
        K, Tc = cfg.cell_slots, cfg.max_cell_len
        B, T = ids.shape
        Vc = cfg.cell_vocab_size
        td = cfg.td_token_ids or (2, 8)
        sos_c, eos_c = Vc - 3, Vc - 2

        is_td = jnp.zeros((B, T), bool)
        for t in td:
            is_td |= ids == t
        order = jnp.argsort(jnp.where(is_td, jnp.arange(T)[None], T + 1),
                            axis=1)[:, :K]                      # (B, K)
        valid = jnp.take_along_axis(is_td, order, axis=1)
        x_i = jnp.take_along_axis(hs, order[..., None], axis=1)  # (B,K,D)

        pe = interleaved_positions(Tc, D)
        scale = math.sqrt(D)

        def step(carry, t):
            tok, kc, vc = carry                      # (B,K), (B,K,Tc,H,Dh)
            emb = jnp.take(embed, tok, axis=0) * scale + pe[t]
            h = jnp.concatenate([emb, x_i], -1) @ cin_w + cin_b
            y = _layer_norm(h, lp["ln1s"], lp["ln1b"])
            q = (y @ lp["q"] + lp["qb"]).reshape(B, K, H, Dh)
            k_new = (y @ lp["k"] + lp["kb"]).reshape(B, K, H, Dh)
            v_new = (y @ lp["v"] + lp["vb"]).reshape(B, K, H, Dh)
            kc = jax.lax.dynamic_update_slice(kc, k_new[:, :, None],
                                              (0, 0, t, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, v_new[:, :, None],
                                              (0, 0, t, 0, 0))
            att = jnp.einsum("bkhd,bkthd->bkht", q, kc) / math.sqrt(Dh)
            att = jnp.where(jnp.arange(Tc)[None, None, None] <= t, att,
                            -1e9)
            sa = jnp.einsum("bkht,bkthd->bkhd", jax.nn.softmax(att, -1),
                            vc).reshape(B, K, D)
            h = h + sa @ lp["o"] + lp["ob"]
            y = _layer_norm(h, lp["ln2s"], lp["ln2b"])
            q2 = (y @ lp["cq"] + lp["cqb"]).reshape(B, K, H, Dh)
            ca = jnp.einsum("bkhd,bshd->bkhs", q2,
                            lp["mem_k"]) / math.sqrt(Dh)
            cv = jnp.einsum("bkhs,bshd->bkhd", jax.nn.softmax(ca, -1),
                            lp["mem_v"]).reshape(B, K, D)
            h = h + cv @ lp["co"] + lp["cob"]
            y = _layer_norm(h, lp["ln3s"], lp["ln3b"])
            h = h + (jax.nn.relu(y @ lp["ff1"] + lp["ff1b"])
                     @ lp["ff2"] + lp["ff2b"])
            logits = _layer_norm(h, fns, fnb) @ w_cell + b_cell
            return (jnp.argmax(logits, -1), kc, vc), logits

        tok0 = jnp.full((B, K), sos_c, jnp.int32)
        kc0 = jnp.zeros((B, K, Tc, H, Dh), jnp.float32)
        (_, _, _), cell_logits = jax.lax.scan(
            step, (tok0, kc0, kc0), jnp.arange(Tc))
        cell_ids = jnp.transpose(jnp.argmax(cell_logits, -1),
                                 (1, 2, 0))          # (B, K, Tc)
        return {"cell_ids": cell_ids, "cell_valid": valid,
                "cell_eos_id": eos_c}
