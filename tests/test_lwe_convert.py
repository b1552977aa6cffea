"""LightweightEdge NAS recognizer: searched-arch rebuild + converter
parity against a hand-built torch replica with the reference's names
(model/ocr_rec_lightweightedge/nas_block/proxyless.py plnas_linear_mix_se)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def build_torch_lwe():
    """Torch replica of OcrRecLightweightEdge built from the architecture
    spec (first_conv + 24 blocks decoded from conv_op_ids + head)."""
    import torch
    import torch.nn as tnn
    from collections import OrderedDict

    def cba(cin, cout, k, s=(1, 1), groups=1, act=True):
        p = (k[0] // 2, k[1] // 2)
        od = [("conv", tnn.Conv2d(cin, cout, k, s, p, groups=groups,
                                  bias=False)),
              ("bn", tnn.BatchNorm2d(cout))]
        if act:
            od.append(("act", tnn.PReLU()))
        return tnn.Sequential(OrderedDict(od))

    def split_channels(total, n):
        import math
        sp = [math.ceil(total / n) for _ in range(n)]
        sp[-1] += total - sum(sp)
        return sp

    class MBConv(tnn.Module):
        def __init__(self, cin, cout, k, s, e):
            super().__init__()
            mid = round(cin * e)
            if e != 1:
                self.inverted_bottleneck = cba(cin, mid, (1, 1))
            self.depth_conv = cba(mid, mid, k, s, groups=mid)
            self.point_conv = cba(mid, cout, (1, 1), act=False)

        def forward(self, x):
            if hasattr(self, "inverted_bottleneck"):
                x = self.inverted_bottleneck(x)
            return self.point_conv(self.depth_conv(x))

    class MixConv(tnn.Module):
        def __init__(self, cin, cout, ks, s, e):
            super().__init__()
            import torch
            mid = round(cin * e)
            self.inverted_bottleneck = cba(cin, mid, (1, 1))
            self.splits = split_channels(mid, len(ks))
            self.mix_conv = tnn.ModuleList(
                [cba(c, c, k, s, groups=c)
                 for k, c in zip(ks, self.splits)])
            self.point_conv = cba(mid, cout, (1, 1), act=False)

        def forward(self, x):
            import torch
            x = self.inverted_bottleneck(x)
            parts = torch.split(x, self.splits, dim=1)
            x = torch.cat([m(p) for m, p in zip(self.mix_conv, parts)], 1)
            return self.point_conv(x)

    class LinMixConv(tnn.Module):
        def __init__(self, cin, cout, ks, s):
            super().__init__()
            self.mix_conv = tnn.ModuleList(
                [cba(cin, cin, k, s, groups=cin) for k in ks])
            self.act = tnn.PReLU()
            self.point_conv = cba(cin * len(ks), cout, (1, 1), act=False)

        def forward(self, x):
            import torch
            x = torch.cat([m(x) for m in self.mix_conv], 1)
            return self.point_conv(self.act(x))

    class RepConv(tnn.Module):
        def __init__(self, cin, cout, ks, s, e):
            super().__init__()
            mid = round(cin * e)
            self.inverted_bottleneck = cba(cin, mid, (1, 1))
            self.rep_conv = tnn.ModuleList(
                [cba(mid, mid, k, s, groups=mid, act=False) for k in ks])
            self.act = tnn.PReLU()
            self.point_conv = cba(mid, cout, (1, 1), act=False)

        def forward(self, x):
            x = self.inverted_bottleneck(x)
            out = self.rep_conv[0](x)
            for m in self.rep_conv[1:]:
                out = out + m(x)
            return self.point_conv(self.act(out))

    class SE(tnn.Module):
        def __init__(self, c, squeeze):
            super().__init__()
            self.fc1 = tnn.Conv2d(c, c // squeeze, 1, bias=True)
            self.fc2 = tnn.Conv2d(c // squeeze, c, 1, bias=True)

        def forward(self, x):
            import torch
            import torch.nn.functional as F
            s = F.adaptive_avg_pool2d(x, 1)
            s = self.fc2(F.relu(self.fc1(s)))
            return torch.sigmoid(s) * x

    class Block(tnn.Module):
        def __init__(self, conv, residual, zero=False):
            super().__init__()
            self.mobile_inverted_conv = conv
            self.residual = residual
            self.zero = zero

        def forward(self, x):
            if self.zero:
                return x
            if self.mobile_inverted_conv is None:
                return x
            y = self.mobile_inverted_conv(x)
            return x + y if self.residual else y

    from pdf_table_tpu.models.rec_ctc.model import LWE_PLAN

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            blocks = []
            cin = 24
            for spec in LWE_PLAN:
                kind = spec[0]
                if kind == "zero":
                    blocks.append(Block(None, False, zero=True))
                    continue
                if kind == "se":
                    blocks.append(Block(SE(cin, spec[1]), False))
                    continue
                kind, ks, e, s, cout, residual = spec
                if kind == "mb":
                    conv = MBConv(cin, cout, ks[0], s, e)
                elif kind == "mix":
                    conv = MixConv(cin, cout, ks, s, e)
                elif kind == "linmix":
                    conv = LinMixConv(cin, cout, ks, s)
                else:
                    conv = RepConv(cin, cout, ks, s, e)
                blocks.append(Block(conv, residual))
                cin = cout

            class Nas(tnn.Module):
                def __init__(self):
                    super().__init__()
                    # positional Sequential like the reference first_conv
                    self.first_conv = tnn.Sequential(
                        tnn.Conv2d(1, 24, 3, 2, 1, bias=False),
                        tnn.BatchNorm2d(24), tnn.PReLU())
                    self.blocks = tnn.ModuleList(blocks)

                def forward(self, x):
                    x = self.first_conv(x)
                    for b in self.blocks:
                        x = b(x)
                    return x

            self.our_nas_model = Nas()
            self.head = tnn.Linear(128, 7644)

        def forward(self, x):
            import torch
            x = x[:, 0:1] * 0.2989 + x[:, 1:2] * 0.5870 + x[:, 2:3] * 0.1140
            x = self.our_nas_model(x)
            x = torch.squeeze(x, 2)
            x = torch.transpose(x, 1, 2)
            b, s, e = x.size()
            return self.head(x.reshape(b * s, e)).view(b, s, -1)

    import torch
    torch.manual_seed(0)
    return Net().eval()


class TestLweConvert:
    @pytest.fixture(scope="class")
    def converted(self):
        from pdf_table_tpu.convert.lwe_convert import convert_lightweight_edge
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.rec_ctc import CTCRecModel, RecConfig

        tm = build_torch_lwe()
        cfg = RecConfig(backbone="lightweight_edge", vocab_size=7644,
                        img_height=32)
        model = CTCRecModel(cfg)
        variables = jax.tree.map(
            np.asarray,
            dict(init_params(model, np.zeros((1, 32, 64, 3), np.float32))))
        src = TorchTensorSource(tm.state_dict())
        rep = convert_lightweight_edge(src, variables)
        return tm, model, variables, rep, src

    def test_full_coverage(self, converted):
        tm, model, variables, rep, src = converted
        assert rep.ok, (rep.missing[:8], rep.shape_errors[:4])
        unused = [u for u in src.unused() if "num_batches" not in u]
        assert not unused, unused[:8]

    def test_forward_parity(self, converted):
        import torch

        tm, model, variables, rep, src = converted
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (2, 32, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(model.apply(variables, jnp.asarray(x),
                                     train=False))
        assert out.shape == ref.shape == (2, 16, 7644)
        diff = np.abs(out - ref).max()
        assert diff < 2e-3, diff
