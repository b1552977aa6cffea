"""DBNet checkpoint conversion: synthetic reference-shaped torch state dict
-> flax tree, verifying complete coverage and shape agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


def build_reference_dbnet18(inner=256):
    """Torch modules named like the reference DBModel (dbnet.py:715):
    torchvision resnet18 backbone + SegDetector decoder."""

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

    class Backbone(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            widths = [64, 128, 256, 512]
            cin = 64
            for i, w in enumerate(widths):
                blocks = []
                for j in range(2):
                    stride = 2 if (i > 0 and j == 0) else 1
                    blocks.append(BasicBlock(cin, w, stride))
                    cin = w
                setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))

    class Decoder(tnn.Module):
        def __init__(self):
            super().__init__()
            q = inner // 4
            self.in5 = tnn.Conv2d(512, inner, 1, bias=False)
            self.in4 = tnn.Conv2d(256, inner, 1, bias=False)
            self.in3 = tnn.Conv2d(128, inner, 1, bias=False)
            self.in2 = tnn.Conv2d(64, inner, 1, bias=False)
            self.out5 = tnn.Sequential(
                tnn.Conv2d(inner, q, 3, padding=1, bias=False),
                tnn.Upsample(scale_factor=8))
            self.out4 = tnn.Sequential(
                tnn.Conv2d(inner, q, 3, padding=1, bias=False),
                tnn.Upsample(scale_factor=4))
            self.out3 = tnn.Sequential(
                tnn.Conv2d(inner, q, 3, padding=1, bias=False),
                tnn.Upsample(scale_factor=2))
            self.out2 = tnn.Conv2d(inner, q, 3, padding=1, bias=False)
            self.binarize = tnn.Sequential(
                tnn.Conv2d(inner, q, 3, padding=1, bias=False),
                tnn.BatchNorm2d(q), tnn.ReLU(),
                tnn.ConvTranspose2d(q, q, 2, 2),
                tnn.BatchNorm2d(q), tnn.ReLU(),
                tnn.ConvTranspose2d(q, 1, 2, 2), tnn.Sigmoid())

    class DBModel(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.decoder = Decoder()

    return DBModel()


def torch_forward(m, x):
    """Eager forward of the reference-shaped torch DBModel."""
    import torch
    import torch.nn.functional as F

    b = m.backbone
    y = F.relu(b.bn1(b.conv1(x)))
    y = F.max_pool2d(y, 3, 2, 1)
    feats = []
    for i in range(1, 5):
        for blk in getattr(b, f"layer{i}"):
            idn = y
            z = F.relu(blk.bn1(blk.conv1(y)))
            z = blk.bn2(blk.conv2(z))
            if hasattr(blk, "downsample"):
                idn = blk.downsample(y)
            y = F.relu(z + idn)
        feats.append(y)
    c2, c3, c4, c5 = feats
    d = m.decoder

    def up(t):
        return F.interpolate(t, scale_factor=2, mode="nearest")

    p5 = d.in5(c5)
    p4 = d.in4(c4) + up(p5)
    p3 = d.in3(c3) + up(p4)
    p2 = d.in2(c2) + up(p3)
    o5 = F.interpolate(d.out5[0](p5), scale_factor=8, mode="nearest")
    o4 = F.interpolate(d.out4[0](p4), scale_factor=4, mode="nearest")
    o3 = F.interpolate(d.out3[0](p3), scale_factor=2, mode="nearest")
    o2 = d.out2(p2)
    return d.binarize(torch.cat([o2, o3, o4, o5], 1))


class TestDbNetConvert:
    def test_full_model_numeric_parity(self):
        """Converted flax DBNet matches the torch forward bit-for-bit
        (<1e-5): the end-to-end conversion-fidelity check SURVEY.md §7
        calls for."""
        from pdf_table_tpu.convert.dbnet_convert import convert_dbnet
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.dbnet import DBNet, DbNetConfig

        tm = build_reference_dbnet18(inner=256)
        tm.eval()
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = torch_forward(tm, torch.from_numpy(x)).numpy()[:, 0]

        cfg = DbNetConfig(backbone="resnet18", inner_channels=256)
        model = DBNet(cfg)
        variables = jax.tree.map(
            np.asarray, dict(init_params(model, jnp.zeros((1, 64, 64, 3)))))
        rep = convert_dbnet(TorchTensorSource(tm.state_dict()), variables,
                            depth=18)
        assert rep.ok
        out = model.apply(jax.tree.map(jnp.asarray, variables),
                          jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        assert np.abs(ref - np.asarray(out["prob"])).max() < 1e-5
    def test_full_coverage(self):
        from pdf_table_tpu.convert.dbnet_convert import convert_dbnet
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.dbnet import DBNet, DbNetConfig

        tmodel = build_reference_dbnet18()
        src = TorchTensorSource(tmodel.state_dict())

        cfg = DbNetConfig(backbone="resnet18", inner_channels=256)
        model = DBNet(cfg)
        variables = init_params(model, jnp.zeros((1, 64, 64, 3)))
        variables = jax.tree.map(np.asarray, dict(variables))

        rep = convert_dbnet(src, variables, depth=18)
        assert rep.ok, (rep.missing[:5], rep.shape_errors[:5])
        # every torch tensor except num_batches_tracked consumed
        leftovers = [k for k in src.unused()
                     if "num_batches_tracked" not in k]
        assert not leftovers, leftovers[:8]

        # converted model still runs
        out = model.apply(jax.tree.map(jnp.asarray, variables),
                          jnp.zeros((1, 64, 64, 3)), train=False)
        assert out["prob"].shape == (1, 64, 64)
