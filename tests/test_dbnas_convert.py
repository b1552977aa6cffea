"""DBNas (proxyless det) searched-arch rebuild + converter parity against
a hand-built torch replica with the reference's names (model/db_net/
proxyless.py CompactDetBackbone + dbnet.py LightSegDetector)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def build_torch_dbnas():
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

    class MBConv(tnn.Module):
        def __init__(self, cin, cout, k, s, e):
            super().__init__()
            mid = round(cin * e)
            self.inverted_bottleneck = cba(cin, mid, (1, 1))
            self.depth_conv = cba(mid, mid, k, s, groups=mid)
            self.point_conv = cba(mid, cout, (1, 1), act=False)

        def forward(self, x):
            return self.point_conv(
                self.depth_conv(self.inverted_bottleneck(x)))

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
            return torch.sigmoid(self.fc2(F.relu(self.fc1(s)))) * x

    class Block(tnn.Module):
        def __init__(self, conv, residual):
            super().__init__()
            self.mobile_inverted_conv = conv
            self.residual = residual

        def forward(self, x):
            y = self.mobile_inverted_conv(x)
            return x + y if self.residual else y

    from pdf_table_tpu.models.dbnet.model import DBNAS_PLAN

    class Backbone(tnn.Module):
        def __init__(self):
            super().__init__()
            self.first_conv = tnn.Sequential(
                tnn.Conv2d(3, 32, 3, 2, 1, bias=False),
                tnn.BatchNorm2d(32), tnn.ReLU())
            blocks, cin = [], 32
            for spec in DBNAS_PLAN:
                if spec[0] == "se":
                    blocks.append(Block(SE(cin, spec[1]), True))
                    continue
                kind, ks, e, s, cout, residual = spec
                conv = (MBConv(cin, cout, ks[0], s, e) if kind == "mb"
                        else RepConv(cin, cout, ks, s, e))
                blocks.append(Block(conv, residual))
                cin = cout
            self.blocks = tnn.ModuleList(blocks)

        def forward(self, x):
            x = self.first_conv(x)
            outs = []
            for i, b in enumerate(self.blocks):
                x = b(x)
                if (i + 1) % 6 == 0:
                    outs.append(x)
            return outs

    class DwPw(tnn.Module):
        def __init__(self, cin, cout, k, p, bias=False):
            super().__init__()
            self.depthwise = tnn.Conv2d(cin, cin, k, 1, p, groups=cin,
                                        bias=bias)
            self.bn1 = tnn.BatchNorm2d(cin)
            self.relu1 = tnn.ReLU()
            self.pointwise = tnn.Conv2d(cin, cout, 1, bias=bias)

        def forward(self, x):
            return self.pointwise(self.relu1(self.bn1(self.depthwise(x))))

    class DwPwT(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.depthwise = tnn.ConvTranspose2d(cin, cin, 2, 2, groups=cin)
            self.bn1 = tnn.BatchNorm2d(cin)
            self.relu1 = tnn.ReLU()
            self.pointwise = tnn.Conv2d(cin, cout, 1)

        def forward(self, x):
            return self.pointwise(self.relu1(self.bn1(self.depthwise(x))))

    class Decoder(tnn.Module):
        def __init__(self, inner=64):
            super().__init__()
            self.up5 = tnn.Upsample(scale_factor=8, mode="nearest")
            self.up4 = tnn.Upsample(scale_factor=4, mode="nearest")
            self.up3 = tnn.Upsample(scale_factor=2, mode="nearest")
            self.in5 = tnn.Conv2d(128, inner, 1, bias=False)
            self.in4 = tnn.Conv2d(96, inner, 1, bias=False)
            self.in3 = tnn.Conv2d(64, inner, 1, bias=False)
            self.in2 = tnn.Conv2d(32, inner, 1, bias=False)
            q = inner // 4
            self.binarize = tnn.Sequential(
                DwPw(inner, q, 5, 2), tnn.BatchNorm2d(q), tnn.ReLU(),
                DwPwT(q, q), tnn.BatchNorm2d(q), tnn.ReLU(),
                DwPwT(q, 1), tnn.Sigmoid())

        def forward(self, feats):
            c2, c3, c4, c5 = feats
            fuse = (self.up5(self.in5(c5)) + self.up4(self.in4(c4))
                    + self.up3(self.in3(c3)) + self.in2(c2))
            return self.binarize(fuse)

    class Full(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.decoder = Decoder()

        def forward(self, x):
            return self.decoder(self.backbone(x))

    import torch
    torch.manual_seed(0)
    return Full().eval()


class TestDbNasConvert:
    @pytest.fixture(scope="class")
    def converted(self):
        from pdf_table_tpu.convert.dbnas_convert import convert_dbnas
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.dbnet import DBNet, DbNetConfig

        tm = build_torch_dbnas()
        cfg = DbNetConfig(backbone="proxylessnas", inner_channels=64)
        model = DBNet(cfg)
        variables = jax.tree.map(
            np.asarray,
            dict(init_params(model, np.zeros((1, 64, 64, 3), np.float32))))
        src = TorchTensorSource(tm.state_dict())
        rep = convert_dbnas(src, variables)
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
        x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(model.apply(variables, jnp.asarray(x),
                                     train=False)["prob"])
        assert out.shape == (1, 64, 64)
        diff = np.abs(out - ref[:, 0]).max()
        assert diff < 2e-3, diff
