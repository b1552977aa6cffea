"""TableMaster checkpoint conversion: full-model numeric parity against a
reference-shaped torch mirror (encoder + GCB + forked master decoder)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

D, HEADS, FF, V, T, N = 512, 8, 128, 12, 4, 2
SOS = V - 3


# -- reference-shaped torch modules (names mirror the reference exactly) ----

class TContext(tnn.Module):
    def __init__(self, c, ratio=0.0625):
        super().__init__()
        planes = int(c * ratio)
        self.conv_mask = tnn.Conv2d(c, 1, 1)
        self.channel_add_conv = tnn.Sequential(
            tnn.Conv2d(c, planes, 1), tnn.LayerNorm([planes, 1, 1]),
            tnn.ReLU(), tnn.Conv2d(planes, c, 1))

    def forward(self, x):
        b, c, h, w = x.shape
        inp = x.view(b, 1, c, h * w)
        mask = self.conv_mask(x).view(b, 1, h * w)
        mask = F.softmax(mask, dim=2).unsqueeze(-1)
        ctx = torch.matmul(inp, mask).view(b, c, 1, 1)
        return x + self.channel_add_conv(ctx)


class TMBasic(tnn.Module):
    def __init__(self, cin, cout, gcb=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        if gcb:
            self.context_block = TContext(cout)
        if cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, bias=False), tnn.BatchNorm2d(cout))

    def forward(self, x):
        res = self.downsample(x) if hasattr(self, "downsample") else x
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if hasattr(self, "context_block"):
            y = self.context_block(y)
        return F.relu(y + res)


class TBackbone(tnn.Module):
    def __init__(self):
        super().__init__()
        cb = lambda ci, co: (tnn.Conv2d(ci, co, 3, 1, 1, bias=False),
                             tnn.BatchNorm2d(co))
        self.conv1, self.bn1 = cb(3, 64)
        self.conv2, self.bn2 = cb(64, 128)
        self.layer1 = tnn.Sequential(TMBasic(128, 256))
        self.conv3, self.bn3 = cb(256, 256)
        self.layer2 = tnn.Sequential(*[TMBasic(256, 256, True)
                                       for _ in range(2)])
        self.conv4, self.bn4 = cb(256, 256)
        self.layer3 = tnn.Sequential(TMBasic(256, 512, True),
                                     *[TMBasic(512, 512, True)
                                       for _ in range(4)])
        self.conv5, self.bn5 = cb(512, 512)
        self.layer4 = tnn.Sequential(*[TMBasic(512, 512, True)
                                       for _ in range(3)])
        self.conv6, self.bn6 = cb(512, 512)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.max_pool2d(x, 2)
        x = self.layer1(x)
        x = F.relu(self.bn3(self.conv3(x)))
        x = F.max_pool2d(x, 2)
        x = self.layer2(x)
        x = F.relu(self.bn4(self.conv4(x)))
        x = F.max_pool2d(x, 2)
        x = self.layer3(x)
        x = F.relu(self.bn5(self.conv5(x)))
        x = self.layer4(x)
        return F.relu(self.bn6(self.conv6(x)))


class TMHA(tnn.Module):
    def __init__(self):
        super().__init__()
        self.linears = tnn.ModuleList([tnn.Linear(D, D) for _ in range(4)])

    def forward(self, q, k, v, mask=None):
        b = q.size(0)
        dk = D // HEADS
        q, k, v = [l(x).view(b, -1, HEADS, dk).transpose(1, 2)
                   for l, x in zip(self.linears, (q, k, v))]
        scores = torch.matmul(q, k.transpose(-2, -1)) / math.sqrt(dk)
        if mask is not None:
            scores = scores.masked_fill(mask == 0, -1e9)
        att = F.softmax(scores, dim=-1)
        x = torch.matmul(att, v).transpose(1, 2).contiguous().view(b, -1, D)
        return self.linears[-1](x)


class TDecLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = TMHA()
        self.src_attn = TMHA()
        self.feed_forward = tnn.Sequential()
        self.feed_forward.w_1 = tnn.Linear(D, FF)
        self.feed_forward.w_2 = tnn.Linear(FF, D)
        self.sublayer = tnn.ModuleList(
            [tnn.Sequential() for _ in range(3)])
        for s in self.sublayer:
            s.norm = tnn.LayerNorm(D)

    def forward(self, x, feature, tgt_mask):
        x = x + self.self_attn(self.sublayer[0].norm(x),
                               self.sublayer[0].norm(x),
                               self.sublayer[0].norm(x), tgt_mask)
        x = x + self.src_attn(self.sublayer[1].norm(x), feature, feature)
        y = self.sublayer[2].norm(x)
        return x + self.feed_forward.w_2(F.relu(self.feed_forward.w_1(y)))


class TDecoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.layers = tnn.ModuleList([TDecLayer() for _ in range(N - 1)])
        self.cls_layer = tnn.ModuleList([TDecLayer()])
        self.bbox_layer = tnn.ModuleList([TDecLayer()])
        self.cls_fc = tnn.Linear(D, V)
        self.bbox_fc = tnn.Sequential(tnn.Linear(D, 4), tnn.Sigmoid())
        self.norm = tnn.LayerNorm(D)
        self.embedding = tnn.Sequential()
        self.embedding.lut = tnn.Embedding(V, D)

    def decode(self, input_ids, feature):
        L = input_ids.size(1)
        x = self.embedding.lut(input_ids) * math.sqrt(D)
        x = x + pe_table(L).to(x)
        mask = torch.tril(torch.ones(L, L)).view(1, 1, L, L)
        for layer in self.layers:
            x = layer(x, feature, mask)
        cls_x = self.norm(self.cls_layer[0](x, feature, mask))
        bbox_x = self.norm(self.bbox_layer[0](x, feature, mask))
        return self.cls_fc(cls_x), self.bbox_fc(bbox_x)


def pe_table(length):
    pos = torch.arange(length).unsqueeze(1).float()
    div = torch.exp(torch.arange(0, D, 2).float()
                    * (-math.log(10000.0) / D))
    pe = torch.zeros(length, D)
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    return pe.unsqueeze(0)


class TTableMaster(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TBackbone()
        self.decoder = TDecoder()

    def greedy(self, img):
        feat = self.backbone(img)
        b, c, h, w = feat.shape
        mem = feat.view(b, c, h * w).permute(0, 2, 1)
        mem = mem + pe_table(h * w).to(mem)
        ids = torch.full((b, 1), SOS, dtype=torch.long)
        logits_steps, bbox_steps = [], []
        for _ in range(T):
            logits, bbox = self.decoder.decode(ids, mem)
            logits_steps.append(logits[:, -1])
            bbox_steps.append(bbox[:, -1])
            ids = torch.cat([ids, logits[:, -1:].argmax(-1)], dim=1)
        return (torch.stack(logits_steps, 1), torch.stack(bbox_steps, 1),
                ids[:, 1:])


def _randomize_bn(model):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.05)


class TestMasterConvert:
    def test_full_model_parity(self):
        from pdf_table_tpu.convert.master_convert import convert_table_master
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.table_master import (TableMaster,
                                                       TableMasterConfig)

        torch.manual_seed(0)
        tmodel = TTableMaster().eval()
        _randomize_bn(tmodel)
        state = {k: v for k, v in tmodel.state_dict().items()}

        cfg = TableMasterConfig(img_size=(32, 32), d_model=D,
                                decoder_layers=N, heads=HEADS, ff_dim=FF,
                                max_structure_len=T, vocab_size=V)
        model = TableMaster(cfg)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = jax.tree_util.tree_map(np.asarray,
                                           dict(init_params(model, x)))
        src = TorchTensorSource(state)
        rep = convert_table_master(src, variables, n_layers=N)
        assert rep.ok, (rep.missing[:8], rep.shape_errors[:8])

        img = np.random.default_rng(1).normal(
            0, 1, (1, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            tlogits, tbbox, tids = tmodel.greedy(
                torch.from_numpy(img.transpose(0, 3, 1, 2)))
        out = model.apply(variables, jnp.asarray(img), train=False)
        jprobs = np.asarray(out["structure_probs"][0])
        jbbox = np.asarray(out["loc_preds"][0])

        tprobs = F.softmax(tlogits[0], dim=-1).numpy()
        assert np.allclose(jprobs, tprobs, atol=2e-3), \
            np.abs(jprobs - tprobs).max()
        assert np.allclose(jbbox, tbbox[0].numpy(), atol=2e-3), \
            np.abs(jbbox - tbbox[0].numpy()).max()
        assert jprobs.argmax(-1).tolist() == tids[0].tolist()

    def test_mtl_cell_branch_parity(self):
        """Cell-content branch: torch mirror of MtlTabNetDecoder's per-cell
        greedy loop vs the flax fixed-slot KV-cache scan."""
        from pdf_table_tpu.convert.master_convert import convert_table_master
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.table_master import (TableMaster,
                                                       TableMasterConfig)

        VC, TC, K = 15, 3, 2
        td_ids = (1, 2)

        torch.manual_seed(3)
        tmodel = TTableMaster().eval()
        _randomize_bn(tmodel)
        tdec = tmodel.decoder
        tdec.cell_layer = tnn.ModuleList([TDecLayer()])
        tdec.cell_fc = tnn.Linear(D, VC)
        tdec.embedding_cell = tnn.Sequential()
        tdec.embedding_cell.lut = tnn.Embedding(VC, D)
        tdec.cell_input_fc = tnn.Linear(2 * D, D)
        with torch.no_grad():   # force td-token emissions for the branch
            tdec.cls_fc.bias[td_ids[0]] = 5.0
        state = dict(tmodel.state_dict())

        cfg = TableMasterConfig(variant="mtl_tabnet", img_size=(32, 32),
                                d_model=D, decoder_layers=N, heads=HEADS,
                                ff_dim=FF, max_structure_len=T,
                                vocab_size=V, cell_vocab_size=VC,
                                max_cell_len=TC, cell_slots=K,
                                td_token_ids=td_ids)
        model = TableMaster(cfg)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = jax.tree_util.tree_map(np.asarray,
                                           dict(init_params(model, x)))
        rep = convert_table_master(src := TorchTensorSource(state),
                                   variables, n_layers=N)
        assert rep.ok, (rep.missing[:8], rep.shape_errors[:8])

        img = np.random.default_rng(7).normal(
            0, 1, (1, 32, 32, 3)).astype(np.float32)
        out = model.apply(variables, jnp.asarray(img), train=False,
                          decode_cells=True)
        assert out["cell_ids"].shape == (1, K, TC)

        # torch mirror of decode_test(decode_cell=True): shared-layer x at
        # td positions -> cell_input_fc(cat(emb*sqrt(D)+pe, x_i)) ->
        # cell_layer -> norm -> cell_fc, greedy
        with torch.no_grad():
            feat = tmodel.backbone(
                torch.from_numpy(img.transpose(0, 3, 1, 2)))
            b, c, h, w = feat.shape
            mem = feat.view(b, c, h * w).permute(0, 2, 1)
            mem = mem + pe_table(h * w).to(mem)
            ids = torch.full((1, 1), SOS, dtype=torch.long)
            for _ in range(T):
                logits, _ = tdec.decode(ids, mem)
                ids = torch.cat([ids, logits[:, -1:].argmax(-1)], dim=1)
            emitted = ids[0, 1:]
            # shared-layer hidden states over the final prefix
            xx = tdec.embedding.lut(ids[:, :-1]) * math.sqrt(D)
            xx = xx + pe_table(T).to(xx)
            mask = torch.tril(torch.ones(T, T)).view(1, 1, T, T)
            for layer in tdec.layers:
                xx = layer(xx, mem, mask)
            pos = [t for t in range(T) if int(emitted[t]) in td_ids][:K]
            sos_c = VC - 3
            t_cells = []
            for pidx in pos:
                x_i = xx[:, pidx:pidx + 1]
                cid = torch.full((1, 1), sos_c, dtype=torch.long)
                step_logits = []
                for s in range(TC):
                    e = tdec.embedding_cell.lut(cid) * math.sqrt(D)
                    e = e + pe_table(s + 1).to(e)
                    xi = x_i.expand(-1, s + 1, -1)
                    xc = tdec.cell_input_fc(torch.cat((e, xi), -1))
                    m = torch.tril(torch.ones(s + 1, s + 1)).view(
                        1, 1, s + 1, s + 1)
                    y = tdec.cell_layer[0](xc, mem, m)
                    lg = tdec.cell_fc(tdec.norm(y))
                    step_logits.append(lg[0, -1])
                    cid = torch.cat([cid, lg[:, -1:].argmax(-1)], dim=1)
                t_cells.append(torch.stack(step_logits).argmax(-1))

        jids = np.asarray(out["cell_ids"][0])
        jvalid = np.asarray(out["cell_valid"][0])
        assert int(jvalid.sum()) == len(pos)
        for k, tc in enumerate(t_cells):
            assert jids[k].tolist() == tc.tolist()
