"""LORE checkpoint conversion tests: detector name/shape coverage +
processor numeric parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# -- reference-shaped torch modules (names mirror the reference exactly) ----

class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)


class TRoot(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 1, bias=False)
        self.bn = tnn.BatchNorm2d(cout)


class TTree(tnn.Module):
    def __init__(self, levels, cin, cout, stride=1, level_root=False,
                 root_dim=0):
        super().__init__()
        if root_dim == 0:
            root_dim = 2 * cout
        if level_root:
            root_dim += cin
        if levels == 1:
            self.tree1 = TBasicBlock(cin, cout, stride)
            self.tree2 = TBasicBlock(cout, cout)
            self.root = TRoot(root_dim, cout)
        else:
            self.tree1 = TTree(levels - 1, cin, cout, stride, root_dim=0)
            self.tree2 = TTree(levels - 1, cout, cout,
                               root_dim=root_dim + cout)
        if cin != cout:
            self.project = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, bias=False), tnn.BatchNorm2d(cout))


class TDLA(tnn.Module):
    def __init__(self, ch=(16, 32, 64, 128, 256, 512)):
        super().__init__()
        self.base_layer = tnn.Sequential(
            tnn.Conv2d(3, ch[0], 7, 1, 3, bias=False),
            tnn.BatchNorm2d(ch[0]), tnn.ReLU())
        self.level0 = tnn.Sequential(
            tnn.Conv2d(ch[0], ch[0], 3, 1, 1, bias=False),
            tnn.BatchNorm2d(ch[0]), tnn.ReLU())
        self.level1 = tnn.Sequential(
            tnn.Conv2d(ch[0], ch[1], 3, 2, 1, bias=False),
            tnn.BatchNorm2d(ch[1]), tnn.ReLU())
        self.level2 = TTree(1, ch[1], ch[2], 2, level_root=False)
        self.level3 = TTree(2, ch[2], ch[3], 2, level_root=True)
        self.level4 = TTree(2, ch[3], ch[4], 2, level_root=True)
        self.level5 = TTree(1, ch[4], ch[5], 2, level_root=True)


class TDeform(tnn.Module):
    """Reference DeformConv: DCN (weight/bias + conv_offset_mask) + actf."""

    def __init__(self, cin, cout):
        super().__init__()

        class DCN(tnn.Module):
            def __init__(self):
                super().__init__()
                self.weight = tnn.Parameter(torch.randn(cout, cin, 3, 3))
                self.bias = tnn.Parameter(torch.zeros(cout))
                self.conv_offset_mask = tnn.Conv2d(cin, 27, 3, padding=1)

        self.conv = DCN()
        self.actf = tnn.Sequential(tnn.BatchNorm2d(cout), tnn.ReLU())


class TIDAUp(tnn.Module):
    def __init__(self, o, channels, up_f):
        super().__init__()
        for i in range(1, len(channels)):
            setattr(self, f"proj_{i}", TDeform(channels[i], o))
            setattr(self, f"node_{i}", TDeform(o, o))
            f = int(up_f[i])
            setattr(self, f"up_{i}",
                    tnn.ConvTranspose2d(o, o, f * 2, stride=f,
                                        padding=f // 2, groups=o, bias=False))


class TDLASeg(tnn.Module):
    def __init__(self, hidden=256, head_conv=256):
        super().__init__()
        ch = [16, 32, 64, 128, 256, 512]
        self.base = TDLA(ch)

        class TDLAUp(tnn.Module):
            def __init__(self):
                super().__init__()
                channels = ch[2:]
                scales = [1, 2, 4, 8]
                in_ch = list(channels)
                import numpy as _np
                sc = _np.array(scales)
                for i in range(3):
                    j = -i - 2
                    setattr(self, f"ida_{i}",
                            TIDAUp(channels[j], in_ch[j:],
                                   list(sc[j:] // sc[j])))
                    sc[j + 1:] = sc[j]
                    in_ch[j + 1:] = [channels[j] for _ in channels[j + 1:]]

        self.dla_up = TDLAUp()
        self.ida_up = TIDAUp(ch[2], ch[2:5], [1, 2, 4])
        heads = {"hm": 2, "st": 8, "wh": 8, "ax": hidden, "cr": hidden,
                 "reg": 2}
        for head, classes in heads.items():
            setattr(self, head, tnn.Sequential(
                tnn.Conv2d(ch[2], head_conv, 3, padding=1, bias=True),
                tnn.ReLU(),
                tnn.Conv2d(head_conv, classes, 1, bias=True)))


class TestLoreDetectorConvert:
    def test_full_coverage(self):
        from pdf_table_tpu.convert.lore_convert import convert_lore_detector
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.lore import LoreConfig, LoreModel

        tm = TDLASeg(hidden=256, head_conv=256)
        src = TorchTensorSource(tm.state_dict())

        cfg = LoreConfig(backbone="dla34", resolution=(64, 64), max_objs=8,
                         hidden_size=256, head_conv=256, tsfm_layers=1,
                         stacking_layers=1)
        model = LoreModel(cfg)
        variables = jax.tree.map(
            np.asarray, dict(init_params(model, jnp.zeros((1, 64, 64, 3)))))
        rep = convert_lore_detector(src, variables, hidden_size=256)
        assert rep.ok, (rep.missing[:6], rep.shape_errors[:6])
        leftovers = [k for k in src.unused()
                     if "num_batches_tracked" not in k]
        assert not leftovers, leftovers[:8]


class TProcessor(tnn.Module):
    """Reference-shaped LoreProcessModel (names only need to match)."""

    def __init__(self, hidden=32, layers=1, heads=4, d_ff=64):
        super().__init__()

        class Norm(tnn.Module):
            def __init__(self, d):
                super().__init__()
                self.alpha = tnn.Parameter(torch.ones(d))
                self.bias = tnn.Parameter(torch.zeros(d))

            def forward(self, x, eps=1e-6):
                return self.alpha * (x - x.mean(-1, keepdim=True)) \
                    / (x.std(-1, keepdim=True) + eps) + self.bias

        class MHA(tnn.Module):
            def __init__(self, d, h):
                super().__init__()
                self.h, self.d_k = h, d // h
                self.q_linear = tnn.Linear(d, d)
                self.v_linear = tnn.Linear(d, d)
                self.k_linear = tnn.Linear(d, d)
                self.out = tnn.Linear(d, d)

            def forward(self, x):
                bs, L, d = x.shape
                q = self.q_linear(x).view(bs, L, self.h, self.d_k)
                k = self.k_linear(x).view(bs, L, self.h, self.d_k)
                v = self.v_linear(x).view(bs, L, self.h, self.d_k)
                q, k, v = (t.transpose(1, 2) for t in (q, k, v))
                s = torch.matmul(q, k.transpose(-2, -1)) / self.d_k ** 0.5
                a = torch.softmax(s, dim=-1)
                o = torch.matmul(a, v).transpose(1, 2).reshape(bs, L, d)
                return self.out(o)

        class FF(tnn.Module):
            def __init__(self, d, d_ff):
                super().__init__()
                self.linear_1 = tnn.Linear(d, d_ff)
                self.linear_2 = tnn.Linear(d_ff, d)

            def forward(self, x):
                return self.linear_2(F.relu(self.linear_1(x)))

        class Layer(tnn.Module):
            def __init__(self, d, h, d_ff):
                super().__init__()
                self.norm_1 = Norm(d)
                self.norm_2 = Norm(d)
                self.attn = MHA(d, h)
                self.ff = FF(d, d_ff)

            def forward(self, x):
                x = x + self.attn(self.norm_1(x))
                x = x + self.ff(self.norm_2(x))
                return x

        class Encoder(tnn.Module):
            def __init__(self, d, n, h, d_ff):
                super().__init__()
                self.layers = tnn.ModuleList(
                    [Layer(d, h, d_ff) for _ in range(n)])

            def forward(self, x):
                for l in self.layers:
                    x = l(x)
                return x

        class Decoder(tnn.Module):
            def __init__(self, d, out):
                super().__init__()
                self.linear = tnn.Sequential(
                    tnn.Linear(d, d), tnn.ReLU(), tnn.Linear(d, out),
                    tnn.ReLU())

            def forward(self, x):
                return self.linear(x)

        class Transformer(tnn.Module):
            def __init__(self, d_in, d, out, n, h, d_ff):
                super().__init__()
                self.linear = tnn.Linear(d_in, d)
                self.encoder = Encoder(d, n, h, d_ff)
                self.decoder = Decoder(d, out)

            def forward(self, x):
                return self.decoder(self.encoder(self.linear(x)))

        class Stacker(tnn.Module):
            def __init__(self, d, n, h, d_ff):
                super().__init__()
                self.logi_encoder = tnn.Sequential(
                    tnn.Linear(4, d), tnn.ReLU(), tnn.Linear(d, d),
                    tnn.ReLU())
                self.tsfm = Transformer(2 * d, d, 4, n, h, d_ff)

            def forward(self, feat, logi):
                y = self.logi_encoder(logi)
                return self.tsfm(torch.cat([feat, y], dim=-1))

        self.hidden = hidden
        self.tsfm_axis = Transformer(hidden, hidden, 4, layers, heads, d_ff)
        self.stacker = Stacker(hidden, layers, heads, d_ff)
        self.x_position_embeddings = tnn.Embedding(64, hidden)
        self.y_position_embeddings = tnn.Embedding(64, hidden)

    def forward(self, feat, dets):
        ps = dets.long().clamp(0, 63)
        f = feat + self.x_position_embeddings(ps[..., 0]) \
            + self.y_position_embeddings(ps[..., 1]) \
            + self.x_position_embeddings(ps[..., 2]) \
            + self.y_position_embeddings(ps[..., 5])
        logi = self.tsfm_axis(f)
        stacked = self.stacker(f, logi)
        return logi, stacked


class TestLoreProcessorConvert:
    def test_numeric_parity(self):
        from pdf_table_tpu.convert.lore_convert import convert_lore_processor
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.models.lore.processor_model import LoreProcessor

        tm = TProcessor(hidden=32, layers=1, heads=4, d_ff=64)
        tm.eval()
        rng = np.random.default_rng(0)
        feat = rng.normal(size=(1, 6, 32)).astype(np.float32)
        dets = rng.integers(0, 60, (1, 6, 8)).astype(np.float32)
        with torch.no_grad():
            ref_logi, ref_stacked = tm(torch.from_numpy(feat),
                                       torch.from_numpy(dets))

        cfg = LoreConfig(hidden_size=32, tsfm_layers=1, stacking_layers=1,
                         num_heads=4, max_fmp_size=64, d_ff=64)
        model = LoreProcessor(cfg)
        # d_ff must match the reference module (test uses 64)
        import pdf_table_tpu.models.lore.processor_model as pm
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.asarray(feat), jnp.asarray(dets))
        variables = jax.tree.map(np.asarray, dict(variables))
        src = TorchTensorSource(tm.state_dict())
        rep = convert_lore_processor(src, variables, tsfm_layers=1,
                                     stacking_layers=1)
        assert rep.ok, (rep.missing[:6], rep.shape_errors[:6])
        logi, stacked = model.apply(jax.tree.map(jnp.asarray, variables),
                                    jnp.asarray(feat), jnp.asarray(dets))
        assert np.abs(np.asarray(logi) - ref_logi.numpy()).max() < 1e-4
        assert np.abs(np.asarray(stacked)
                      - ref_stacked.numpy()).max() < 1e-4


def build_dla_centernet_torch(heads: dict, head_conv=16):
    """Reference-shaped DLA CenterNet with arbitrary heads."""
    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            ch = [16, 32, 64, 128, 256, 512]
            self.base = TDLA(ch)

            class TDLAUp(tnn.Module):
                def __init__(self):
                    super().__init__()
                    channels = ch[2:]
                    in_ch = list(channels)
                    import numpy as _np
                    sc = _np.array([1, 2, 4, 8])
                    for i in range(3):
                        j = -i - 2
                        setattr(self, f"ida_{i}",
                                TIDAUp(channels[j], in_ch[j:],
                                       list(sc[j:] // sc[j])))
                        sc[j + 1:] = sc[j]
                        in_ch[j + 1:] = [channels[j] for _ in channels[j + 1:]]

            self.dla_up = TDLAUp()
            self.ida_up = TIDAUp(ch[2], ch[2:5], [1, 2, 4])
            for head, classes in heads.items():
                setattr(self, head, tnn.Sequential(
                    tnn.Conv2d(ch[2], head_conv, 3, padding=1),
                    tnn.ReLU(), tnn.Conv2d(head_conv, classes, 1)))
    return M()


class TestCenterNetFamilyConvert:
    def test_docx_layout_coverage(self):
        from pdf_table_tpu.convert.centernet_convert import convert_docx_layout
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.docx_layout import (DocXLayoutConfig,
                                                      DocXLayoutModel)

        heads = {"cls": 4, "ftype": 3, "hm": 11, "hm_sub": 2, "reg": 2,
                 "wh": 8}
        tm = build_dla_centernet_torch(heads, head_conv=16)
        src = TorchTensorSource(tm.state_dict())
        cfg = DocXLayoutConfig(resolution=(64, 64), head_conv=16)
        model = DocXLayoutModel(cfg)
        variables = jax.tree.map(
            np.asarray, dict(init_params(model, jnp.zeros((1, 64, 64, 3)))))
        rep = convert_docx_layout(src, variables)
        assert rep.ok, (rep.missing[:6], rep.shape_errors[:6])
        leftovers = [k for k in src.unused()
                     if "num_batches_tracked" not in k]
        assert not leftovers, leftovers[:8]

    def test_cycle_centernet_coverage(self):
        from pdf_table_tpu.convert.centernet_convert import (
            convert_cycle_centernet)
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.center_net import (CenterNetConfig,
                                                     CycleCenterNet)

        heads = {"hm": 2, "v2c": 8, "c2v": 8, "reg": 2}
        tm = build_dla_centernet_torch(heads, head_conv=16)
        src = TorchTensorSource(tm.state_dict())
        cfg = CenterNetConfig(resolution=(64, 64), head_conv=16, K=4, MK=8)
        model = CycleCenterNet(cfg)
        variables = jax.tree.map(
            np.asarray, dict(init_params(model, jnp.zeros((1, 64, 64, 3)))))
        rep = convert_cycle_centernet(src, variables)
        assert rep.ok, (rep.missing[:6], rep.shape_errors[:6])
