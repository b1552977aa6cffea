"""PULC PP-LCNet conversion: reference-shaped torch mirror -> flax,
full-coverage + forward parity.

Mirror follows the reference torch network exactly
(model/cls/cls_pp_lcnet.py:164 PPLCNet; ConvBNLayer :77, DepthwiseSeparable
:104, SEModule :134): conv1 stem s2, blocks2..6 depthwise-separable stages
(SE on blocks6), global avg pool, bias-free 1280 last_conv + hardswish, fc.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from pdf_table_tpu.convert.pplcnet_convert import convert_pplcnet  # noqa: E402
from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource  # noqa: E402
from pdf_table_tpu.engine.params import init_params  # noqa: E402
from pdf_table_tpu.models.cls import ClsPulcConfig, PPLCNetClassifier  # noqa: E402

NET_CONFIG = {  # k, in_c, out_c, s, se — PPLCNet spec
    2: [(3, 16, 32, 1, False)],
    3: [(3, 32, 64, 2, False), (3, 64, 64, 1, False)],
    4: [(3, 64, 128, 2, False), (3, 128, 128, 1, False)],
    5: [(3, 128, 256, 2, False)] + [(5, 256, 256, 1, False)] * 5,
    6: [(5, 256, 512, 2, True), (5, 512, 512, 1, True)],
}


class ConvBN(tnn.Module):
    def __init__(self, cin, cout, k, s, groups=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = tnn.Hardswish()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class SE(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = tnn.Conv2d(c, c // 4, 1)
        self.conv2 = tnn.Conv2d(c // 4, c, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.relu(self.conv1(s))
        s = tnn.functional.hardsigmoid(self.conv2(s))
        return x * s


class DWSep(tnn.Module):
    def __init__(self, cin, cout, k, s, use_se):
        super().__init__()
        self.dw_conv = ConvBN(cin, cin, k, s, groups=cin)
        if use_se:
            self.se = SE(cin)
        self.use_se = use_se
        self.pw_conv = ConvBN(cin, cout, 1, 1)

    def forward(self, x):
        x = self.dw_conv(x)
        if self.use_se:
            x = self.se(x)
        return self.pw_conv(x)


class TorchPPLCNet(tnn.Module):
    def __init__(self, class_num=4, class_expand=1280):
        super().__init__()
        self.conv1 = ConvBN(3, 16, 3, 2)
        for stage, cfg in NET_CONFIG.items():
            setattr(self, f"blocks{stage}", tnn.Sequential(
                *[DWSep(ic, oc, k, s, se) for (k, ic, oc, s, se) in cfg]))
        self.last_conv = tnn.Conv2d(512, class_expand, 1, bias=False)
        self.fc = tnn.Linear(class_expand, class_num)

    def forward(self, x):
        x = self.conv1(x)
        for stage in range(2, 7):
            x = getattr(self, f"blocks{stage}")(x)
        x = x.mean((2, 3), keepdim=True)
        x = tnn.functional.hardswish(self.last_conv(x))
        x = x.flatten(1)
        return torch.softmax(self.fc(x), dim=-1)


def randomize_torch(model, seed=0):
    """Random weights AND random bn running stats so stats conversion is
    exercised (fresh bn stats mean=0/var=1 would hide mapping bugs)."""
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k or "bn.weight" in k:
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.05
    model.load_state_dict(sd)
    return model


class TestPPLCNetConvert:
    def test_full_coverage_and_forward_parity(self):
        tmodel = randomize_torch(TorchPPLCNet()).eval()

        cfg = ClsPulcConfig(task_type="text_image_orientation")
        model = PPLCNetClassifier(cfg)
        x = np.random.default_rng(0).normal(
            size=(2, 64, 96, 3)).astype(np.float32)
        variables = jax.tree.map(
            np.asarray, dict(init_params(model, jnp.asarray(x))))

        src = TorchTensorSource(tmodel.state_dict())
        rep = convert_pplcnet(src, variables)
        assert rep.ok, (rep.missing[:8], rep.shape_errors[:8])
        unused = [u for u in src.unused() if "num_batches" not in u]
        assert unused == [], unused

        with torch.no_grad():
            want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(model.apply(jax.tree.map(jnp.asarray, variables),
                                     jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestPPLCNetOnnxRoundtrip:
    def test_onnx_ingestion_forward_parity(self):
        """Close the real-checkpoint loop (VERDICT r2 #2): serialize the
        torch mirror as Paddle-style ONNX initializers (anonymous names,
        execution order, OIHW, unfused BN), ingest through
        read_onnx_initializers -> match_by_shape_with_stats, assert the
        same forward parity as the state-dict path."""
        from helpers_onnx import paddle_style_onnx_bytes

        from pdf_table_tpu.convert.onnx_reader import read_onnx_initializers
        from pdf_table_tpu.convert.onnx_shape_matcher import (
            call_ordered_slots, match_by_shape_with_stats)

        tmodel = randomize_torch(TorchPPLCNet()).eval()
        data = paddle_style_onnx_bytes(tmodel, torch.zeros(2, 3, 64, 96))
        tensors = read_onnx_initializers(data)
        assert len(tensors) > 50

        cfg = ClsPulcConfig(task_type="text_image_orientation")
        model = PPLCNetClassifier(cfg)
        x = np.random.default_rng(1).normal(
            size=(2, 64, 96, 3)).astype(np.float32)
        variables = jax.tree.map(
            np.asarray, dict(init_params(model, jnp.asarray(x))))
        slots = call_ordered_slots(model, jnp.zeros((1, 64, 96, 3)))
        rep = match_by_shape_with_stats(tensors, variables, slots)
        assert rep.ok, (rep.missing[:8], rep.shape_errors[:8])

        with torch.no_grad():
            want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(model.apply(jax.tree.map(jnp.asarray, variables),
                                     jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-5)
