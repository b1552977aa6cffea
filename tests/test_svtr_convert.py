"""SVTR-LCNet (PP-OCRv3 rec) conversion: PaddleOCR-shaped torch mirror ->
flax, full coverage + forward parity.

Mirror follows the PaddleOCR rec graph the reference downloads as ONNX
(model/ocr_rec_pp/): MobileNetV1Enhance scale 0.5 with (2,1) height
strides, (1,2) final SE block and 2x2 avg pool; EncoderWithSVTR (dims 64,
2 global blocks, hidden 120, 8 heads, swish convs); CTC fc.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from pdf_table_tpu.convert.svtr_convert import convert_svtr_lcnet  # noqa: E402
from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource  # noqa: E402
from pdf_table_tpu.engine.params import init_params  # noqa: E402
from pdf_table_tpu.models.rec_ctc import CTCRecModel, RecConfig  # noqa: E402
from pdf_table_tpu.models.rec_ctc.model import MV1_ENHANCE_CFG  # noqa: E402
from tests.test_pplcnet_convert import randomize_torch  # noqa: E402


class ConvBN(tnn.Module):
    def __init__(self, cin, cout, k, s=1, groups=1, act="hardswish"):
        super().__init__()
        if isinstance(s, int):
            s = (s, s)
        self.conv = tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act_name = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.hardswish(x) if self.act_name == "hardswish" else F.silu(x)


class SE(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = tnn.Conv2d(c, c // 4, 1)
        self.conv2 = tnn.Conv2d(c // 4, c, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.relu(self.conv1(s))
        return x * F.hardsigmoid(self.conv2(s))


class DWSep(tnn.Module):
    def __init__(self, cin, cout, k, s, use_se):
        super().__init__()
        self.dw = ConvBN(cin, cin, k, s, groups=cin)
        if use_se:
            self.se = SE(cin)
        self.use_se = use_se
        self.pw = ConvBN(cin, cout, 1)

    def forward(self, x):
        x = self.dw(x)
        if self.use_se:
            x = self.se(x)
        return self.pw(x)


class MV1Enhance(tnn.Module):
    def __init__(self, scale=0.5):
        super().__init__()
        self.conv1 = ConvBN(3, int(32 * scale), 3, 2)
        blocks, cin = [], int(32 * scale)
        for (_, f2, s, k, se) in MV1_ENHANCE_CFG:
            blocks.append(DWSep(cin, int(f2 * scale), k, s, se))
            cin = int(f2 * scale)
        self.blocks = tnn.ModuleList(blocks)

    def forward(self, x):
        x = self.conv1(x)
        for b in self.blocks:
            x = b(x)
        return F.avg_pool2d(x, 2, 2)


class SVTRBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.fc1 = tnn.Linear(dim, 2 * dim)
        self.fc2 = tnn.Linear(2 * dim, dim)

    def forward(self, x):
        B, T, D = x.shape
        h = self.heads
        qkv = self.qkv(self.norm1(x)).reshape(B, T, 3, h, D // h)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = torch.softmax(q @ k.transpose(-2, -1) * (D // h) ** -0.5, -1)
        ctx = (att @ v).transpose(1, 2).reshape(B, T, D)
        x = x + self.proj(ctx)
        y = F.silu(self.fc1(self.norm2(x)))
        return x + self.fc2(y)


class EncoderWithSVTR(tnn.Module):
    def __init__(self, cin, dims=64, depth=2, hidden=120, heads=8):
        super().__init__()
        self.conv1 = ConvBN(cin, cin // 8, 3, act="swish")
        self.conv2 = ConvBN(cin // 8, hidden, 1, act="swish")
        self.svtr_block = tnn.ModuleList(
            [SVTRBlock(hidden, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(hidden, eps=1e-6)
        self.conv3 = ConvBN(hidden, cin, 1, act="swish")
        self.conv4 = ConvBN(2 * cin, cin // 8, 3, act="swish")
        self.conv1x1 = ConvBN(cin // 8, dims, 1, act="swish")

    def forward(self, x):
        h = x
        z = self.conv2(self.conv1(x))
        B, C, H, W = z.shape
        z = z.flatten(2).transpose(1, 2)
        for blk in self.svtr_block:
            z = blk(z)
        z = self.norm(z)
        z = z.reshape(B, H, W, C).permute(0, 3, 1, 2)
        z = self.conv3(z)
        z = torch.cat((h, z), dim=1)
        return self.conv1x1(self.conv4(z))


class TorchSVTRLCNet(tnn.Module):
    def __init__(self, vocab=97, scale=0.5):
        super().__init__()
        self.backbone = MV1Enhance(scale)
        self.neck = EncoderWithSVTR(int(1024 * scale))
        self.head = tnn.Module()
        self.head.fc = tnn.Linear(64, vocab)

    def forward(self, x):
        x = self.neck(self.backbone(x))     # (B, dims, 1, W')
        x = x.mean(2).transpose(1, 2)       # Im2Seq -> (B, W', dims)
        return self.head.fc(x)


class TestSvtrConvert:
    def test_full_coverage_and_forward_parity(self):
        tmodel = randomize_torch(TorchSVTRLCNet()).eval()

        cfg = RecConfig(backbone="svtr_lcnet", vocab_size=97)
        model = CTCRecModel(cfg)
        x = np.random.default_rng(3).normal(
            size=(1, 48, 96, 3)).astype(np.float32)
        variables = jax.tree.map(
            np.asarray, dict(init_params(model, jnp.asarray(x))))

        src = TorchTensorSource(tmodel.state_dict())
        rep = convert_svtr_lcnet(src, variables)
        assert rep.ok, (rep.missing[:8], rep.shape_errors[:8])
        unused = [u for u in src.unused() if "num_batches" not in u]
        assert unused == [], unused

        with torch.no_grad():
            want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(model.apply(jax.tree.map(jnp.asarray, variables),
                                     jnp.asarray(x), train=False))
        assert got.shape == want.shape  # (B, 12, 97) for 96-wide input
        np.testing.assert_allclose(got, want, atol=5e-5)


class TestSvtrOnnxRoundtrip:
    def test_onnx_ingestion_forward_parity(self):
        """Real-checkpoint loop (VERDICT r2 #2): Paddle-style .onnx bytes
        -> onnx_reader -> call-ordered shape match -> forward parity."""
        from helpers_onnx import paddle_style_onnx_bytes

        from pdf_table_tpu.convert.onnx_reader import read_onnx_initializers
        from pdf_table_tpu.convert.onnx_shape_matcher import (
            call_ordered_slots, match_by_shape_with_stats)

        tmodel = randomize_torch(TorchSVTRLCNet()).eval()
        tensors = read_onnx_initializers(
            paddle_style_onnx_bytes(tmodel, torch.zeros(1, 3, 48, 96)))

        cfg = RecConfig(backbone="svtr_lcnet", vocab_size=97)
        model = CTCRecModel(cfg)
        x = np.random.default_rng(9).normal(
            size=(1, 48, 96, 3)).astype(np.float32)
        variables = jax.tree.map(
            np.asarray, dict(init_params(model, jnp.asarray(x))))
        slots = call_ordered_slots(model, jnp.zeros((1, 48, 96, 3)))
        rep = match_by_shape_with_stats(tensors, variables, slots)
        assert rep.ok, (rep.missing[:8], rep.shape_errors[:8])

        with torch.no_grad():
            want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(model.apply(jax.tree.map(jnp.asarray, variables),
                                     jnp.asarray(x), train=False))
        np.testing.assert_allclose(got, want, atol=5e-5)
