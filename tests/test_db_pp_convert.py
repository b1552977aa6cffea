"""PP-OCR DB (db_pp) conversion: PaddleOCR-shaped torch mirror -> flax,
full coverage + forward parity.

Mirror follows the PaddleOCR det graph the reference downloads as ONNX
(model/db_pp/processor_ocr_db_pp.py preprocessing implies 3x?x? imagenet
input): MobileNetV3-large-0.5 student (disable_se), RSE-FPN 96, DB head.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from pdf_table_tpu.convert.db_pp_convert import convert_db_pp  # noqa: E402
from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource  # noqa: E402
from pdf_table_tpu.engine.params import init_params  # noqa: E402
from pdf_table_tpu.models.dbnet import DBNet, DbNetConfig  # noqa: E402
from pdf_table_tpu.models.dbnet.model import MobileNetV3Det  # noqa: E402
from tests.test_pplcnet_convert import randomize_torch  # noqa: E402


def mdiv(v, d=8):
    out = max(d, int(v + d / 2) // d * d)
    return out + d if out < 0.9 * v else out


class ConvBN(tnn.Module):
    def __init__(self, cin, cout, k, s=1, groups=1, act=None):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        if self.act == "relu":
            x = torch.relu(x)
        elif self.act == "hardswish":
            x = F.hardswish(x)
        return x


class ResidualUnit(tnn.Module):
    def __init__(self, cin, mid, cout, k, s, act):
        super().__init__()
        self.expand_conv = ConvBN(cin, mid, 1, act=act)
        self.bottleneck_conv = ConvBN(mid, mid, k, s, groups=mid, act=act)
        self.linear_conv = ConvBN(mid, cout, 1)
        self.shortcut = s == 1 and cin == cout

    def forward(self, x):
        y = self.linear_conv(self.bottleneck_conv(self.expand_conv(x)))
        return x + y if self.shortcut else y


class MV3Backbone(tnn.Module):
    """PaddleOCR det_mobilenet_v3 layout: stem ``conv``, blocks grouped in
    ``stages`` at stride-2 boundaries, trailing 1x1 in the last stage."""

    def __init__(self, scale=0.5):
        super().__init__()
        self.conv = ConvBN(3, mdiv(16 * scale), 3, 2, act="hardswish")
        cin = mdiv(16 * scale)
        stages, block_list = [], []
        for i, (k, e, c, _, act, s) in enumerate(MobileNetV3Det.CFG):
            if s == 2 and i > 2:
                stages.append(block_list)
                block_list = []
            block_list.append(
                ResidualUnit(cin, mdiv(e * scale), mdiv(c * scale), k, s, act))
            cin = mdiv(c * scale)
        block_list.append(ConvBN(cin, mdiv(960 * scale), 1, act="hardswish"))
        stages.append(block_list)
        self.stages = tnn.ModuleList(
            [tnn.Sequential(*bl) for bl in stages])

    def forward(self, x):
        x = self.conv(x)
        outs = []
        for stage in self.stages:
            x = stage(x)
            outs.append(x)
        return outs


class RSELayer(tnn.Module):
    def __init__(self, cin, cout, k):
        super().__init__()
        self.in_conv = tnn.Conv2d(cin, cout, k, padding=(k - 1) // 2,
                                  bias=False)
        self.se_block = tnn.Module()
        self.se_block.conv1 = tnn.Conv2d(cout, cout // 4, 1)
        self.se_block.conv2 = tnn.Conv2d(cout // 4, cout, 1)

    def forward(self, x):
        y = self.in_conv(x)
        s = y.mean((2, 3), keepdim=True)
        s = torch.relu(self.se_block.conv1(s))
        s = F.hardsigmoid(self.se_block.conv2(s))
        return y + y * s


class RSEFPN(tnn.Module):
    def __init__(self, cins, cout=96):
        super().__init__()
        self.ins_conv = tnn.ModuleList(
            [RSELayer(c, cout, 1) for c in cins])
        self.inp_conv = tnn.ModuleList(
            [RSELayer(cout, cout // 4, 3) for _ in cins])

    def forward(self, feats):
        c2, c3, c4, c5 = feats
        in5 = self.ins_conv[3](c5)
        in4 = self.ins_conv[2](c4)
        in3 = self.ins_conv[1](c3)
        in2 = self.ins_conv[0](c2)
        out4 = in4 + F.interpolate(in5, scale_factor=2, mode="nearest")
        out3 = in3 + F.interpolate(out4, scale_factor=2, mode="nearest")
        out2 = in2 + F.interpolate(out3, scale_factor=2, mode="nearest")
        p5 = F.interpolate(self.inp_conv[3](in5), scale_factor=8,
                           mode="nearest")
        p4 = F.interpolate(self.inp_conv[2](out4), scale_factor=4,
                           mode="nearest")
        p3 = F.interpolate(self.inp_conv[1](out3), scale_factor=2,
                           mode="nearest")
        p2 = self.inp_conv[0](out2)
        return torch.cat([p5, p4, p3, p2], dim=1)


class DBHeadPart(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        q = cin // 4
        self.conv1 = tnn.Conv2d(cin, q, 3, padding=1, bias=False)
        self.conv_bn1 = tnn.BatchNorm2d(q)
        self.conv2 = tnn.ConvTranspose2d(q, q, 2, 2)
        self.conv_bn2 = tnn.BatchNorm2d(q)
        self.conv3 = tnn.ConvTranspose2d(q, 1, 2, 2)

    def forward(self, x):
        x = torch.relu(self.conv_bn1(self.conv1(x)))
        x = torch.relu(self.conv_bn2(self.conv2(x)))
        return torch.sigmoid(self.conv3(x))


class TorchDBPP(tnn.Module):
    def __init__(self, scale=0.5, neck=96):
        super().__init__()
        self.backbone = MV3Backbone(scale)
        cins = [mdiv(c * scale) for c in (24, 40, 112)] + [mdiv(960 * scale)]
        self.neck = RSEFPN(cins, neck)
        self.head = tnn.Module()
        self.head.binarize = DBHeadPart(neck)

    def forward(self, x):
        return self.head.binarize(self.neck(self.backbone(x)))


class TestDbPPConvert:
    def test_full_coverage_and_forward_parity(self):
        tmodel = randomize_torch(TorchDBPP()).eval()

        cfg = DbNetConfig.ppocr()
        model = DBNet(cfg)
        x = np.random.default_rng(2).normal(
            size=(1, 64, 64, 3)).astype(np.float32)
        variables = jax.tree.map(
            np.asarray, dict(init_params(model, jnp.asarray(x))))

        src = TorchTensorSource(tmodel.state_dict())
        rep = convert_db_pp(src, variables)
        assert rep.ok, (rep.missing[:8], rep.shape_errors[:8])
        unused = [u for u in src.unused() if "num_batches" not in u]
        assert unused == [], unused

        with torch.no_grad():
            want = tmodel(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).numpy()[:, 0]
        got = np.asarray(model.apply(jax.tree.map(jnp.asarray, variables),
                                     jnp.asarray(x), train=False)["prob"])
        np.testing.assert_allclose(got, want, atol=3e-5)


class TestDbPPOnnxRoundtrip:
    def test_onnx_ingestion_forward_parity(self):
        """Real-checkpoint loop (VERDICT r2 #2): Paddle-style .onnx bytes
        -> onnx_reader -> call-ordered shape match -> forward parity."""
        from helpers_onnx import paddle_style_onnx_bytes

        from pdf_table_tpu.convert.onnx_reader import read_onnx_initializers
        from pdf_table_tpu.convert.onnx_shape_matcher import (
            call_ordered_slots, match_by_shape_with_stats)

        tmodel = randomize_torch(TorchDBPP()).eval()
        tensors = read_onnx_initializers(
            paddle_style_onnx_bytes(tmodel, torch.zeros(1, 3, 64, 64)))

        cfg = DbNetConfig.ppocr()
        model = DBNet(cfg)
        x = np.random.default_rng(7).normal(
            size=(1, 64, 64, 3)).astype(np.float32)
        variables = jax.tree.map(
            np.asarray, dict(init_params(model, jnp.asarray(x))))
        slots = call_ordered_slots(model, jnp.zeros((1, 64, 64, 3)))
        rep = match_by_shape_with_stats(tensors, variables, slots)
        assert rep.ok, (rep.missing[:8], rep.shape_errors[:8])

        with torch.no_grad():
            want = tmodel(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).numpy()[:, 0]
        got = np.asarray(model.apply(jax.tree.map(jnp.asarray, variables),
                                     jnp.asarray(x), train=False)["prob"])
        np.testing.assert_allclose(got, want, atol=3e-5)
