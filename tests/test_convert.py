"""Weight-conversion numeric parity: torch layers vs converted flax layers.

This is the per-layer diffing harness SURVEY.md §7 calls a prerequisite for
checkpoint fidelity — tiny random torch modules run against flax modules
loaded with converted weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def to_nhwc(x_t):
    return jnp.asarray(x_t.detach().numpy().transpose(0, 2, 3, 1))


class TestLayerParity:
    def test_conv2d(self):
        import flax.linen as nn

        from pdf_table_tpu.convert.torch_to_flax import convert_conv

        tconv = torch.nn.Conv2d(3, 8, 3, padding=1)
        x = torch.randn(1, 3, 16, 16)
        ref = tconv(x).detach().numpy().transpose(0, 2, 3, 1)

        fconv = nn.Conv(8, (3, 3), padding="SAME")
        variables = fconv.init(jax.random.PRNGKey(0), to_nhwc(x))
        variables = {"params": {
            "kernel": jnp.asarray(convert_conv(tconv.weight.detach().numpy())),
            "bias": jnp.asarray(tconv.bias.detach().numpy())}}
        out = fconv.apply(variables, to_nhwc(x))
        assert np.abs(np.asarray(out) - ref).max() < 1e-4

    def test_conv2d_strided(self):
        import flax.linen as nn

        from pdf_table_tpu.convert.torch_to_flax import convert_conv

        tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1, bias=False)
        x = torch.randn(1, 4, 16, 16)
        ref = tconv(x).detach().numpy().transpose(0, 2, 3, 1)
        fconv = nn.Conv(6, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False)
        variables = {"params": {
            "kernel": jnp.asarray(convert_conv(tconv.weight.detach().numpy()))}}
        out = fconv.apply(variables, to_nhwc(x))
        assert np.abs(np.asarray(out) - ref).max() < 1e-4

    def test_linear(self):
        import flax.linen as nn

        from pdf_table_tpu.convert.torch_to_flax import convert_dense

        tl = torch.nn.Linear(10, 5)
        x = torch.randn(2, 10)
        ref = tl(x).detach().numpy()
        fl = nn.Dense(5)
        variables = {"params": {
            "kernel": jnp.asarray(convert_dense(tl.weight.detach().numpy())),
            "bias": jnp.asarray(tl.bias.detach().numpy())}}
        out = fl.apply(variables, jnp.asarray(x.numpy()))
        assert np.abs(np.asarray(out) - ref).max() < 1e-5

    def test_batchnorm_inference(self):
        import flax.linen as nn

        from pdf_table_tpu.convert.torch_to_flax import (TorchTensorSource,
                                                         convert_bn)

        tbn = torch.nn.BatchNorm2d(6)
        tbn.eval()
        with torch.no_grad():
            tbn.running_mean.copy_(torch.randn(6))
            tbn.running_var.copy_(torch.rand(6) + 0.5)
            tbn.weight.copy_(torch.randn(6))
            tbn.bias.copy_(torch.randn(6))
        x = torch.randn(1, 6, 8, 8)
        ref = tbn(x).detach().numpy().transpose(0, 2, 3, 1)

        src = TorchTensorSource({f"bn.{k}": v for k, v in
                                 tbn.state_dict().items()})
        c = convert_bn("bn", src)
        fbn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
        variables = {"params": {"scale": jnp.asarray(c["scale"]),
                                "bias": jnp.asarray(c["bias"])},
                     "batch_stats": {"mean": jnp.asarray(c["mean"]),
                                     "var": jnp.asarray(c["var"])}}
        out = fbn.apply(variables, to_nhwc(x))
        assert np.abs(np.asarray(out) - ref).max() < 1e-4

    def test_conv_transpose(self):
        import flax.linen as nn

        from pdf_table_tpu.convert.torch_to_flax import convert_conv_transpose

        tct = torch.nn.ConvTranspose2d(4, 3, 2, stride=2, bias=False)
        x = torch.randn(1, 4, 8, 8)
        ref = tct(x).detach().numpy().transpose(0, 2, 3, 1)
        fct = nn.ConvTranspose(3, (2, 2), strides=(2, 2), use_bias=False)
        k = convert_conv_transpose(tct.weight.detach().numpy())
        variables = {"params": {"kernel": jnp.asarray(k.copy())}}
        out = fct.apply(variables, to_nhwc(x))
        assert np.abs(np.asarray(out) - ref).max() < 1e-4


class TestSourceAndReport:
    def test_module_prefix_strip_and_unused(self):
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource

        src = TorchTensorSource({"module.a": torch.ones(2),
                                 "b": torch.zeros(3)})
        assert "a" in src and "b" in src
        src.get("a")
        assert src.unused() == ["b"]

    def test_report_shape_check(self):
        from pdf_table_tpu.convert.torch_to_flax import ConversionReport

        tree = {"layer": {"kernel": np.zeros((3, 3, 2, 4))}}
        rep = ConversionReport()
        rep.check_assign(tree, ["layer", "kernel"],
                         np.ones((3, 3, 2, 4)), "t.w")
        assert rep.ok and tree["layer"]["kernel"].max() == 1.0
        rep.check_assign(tree, ["layer", "kernel"],
                         np.ones((1, 1, 2, 4)), "t.w2")
        assert not rep.ok and rep.shape_errors


class TestDepthwiseUpsample:
    def test_matches_torch_grouped_deconv(self):
        import jax.numpy as jnp

        from pdf_table_tpu.models.lore.dla import DepthwiseUpsample

        f, C = 2, 6
        up = torch.nn.ConvTranspose2d(C, C, f * 2, stride=f, padding=f // 2,
                                      groups=C, bias=False)
        torch.manual_seed(0)
        up.weight.data = torch.randn_like(up.weight.data)
        x = torch.randn(1, C, 8, 8)
        ref = up(x).detach().numpy().transpose(0, 2, 3, 1)

        mod = DepthwiseUpsample(f)
        wk = up.weight.detach().numpy()[:, 0].transpose(1, 2, 0)[:, :, None, :]
        out = mod.apply({"params": {"kernel": jnp.asarray(wk)}},
                        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        assert np.abs(ref - np.asarray(out)).max() < 1e-5


class TestOnnxReader:
    def test_roundtrip(self):
        from pdf_table_tpu.convert.onnx_reader import (encode_test_onnx,
                                                       read_onnx_initializers)

        tensors = {
            "conv1.w_0": np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2),
            "fc.b_0": np.array([1.5, -2.5], np.float32),
            "shape": np.array([1, 3, 48, 320], np.int64),
        }
        blob = encode_test_onnx(tensors)
        out = read_onnx_initializers(blob)
        assert set(out) == set(tensors)
        for k in tensors:
            assert out[k].dtype == tensors[k].dtype
            assert np.array_equal(out[k], tensors[k]), k


class TestOnnxShapeMatcher:
    def test_sequential_cnn_roundtrip(self):
        """Build a tiny flax CNN, export its params as ordered ONNX
        initializers (torch-layout), scramble values, and verify the shape
        matcher restores them in order."""
        import flax.linen as nn

        from pdf_table_tpu.convert.onnx_reader import (encode_test_onnx,
                                                       read_onnx_initializers)
        from pdf_table_tpu.convert.onnx_shape_matcher import (flatten_params,
                                                              match_by_shape)

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(8, (3, 3), name="c1")(x)
                x = nn.Conv(16, (3, 3), name="c2")(x)
                x = x.mean(axis=(1, 2))
                return nn.Dense(4, name="fc")(x)

        m = Tiny()
        variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        params = jax.tree.map(np.asarray, dict(variables))["params"]

        rng = np.random.default_rng(0)
        onnx_tensors = {}
        for i, (name, val) in enumerate(flatten_params(params)):
            v = rng.normal(size=val.shape).astype(np.float32)
            if val.ndim == 4:   # to ONNX OIHW
                v_onnx = np.transpose(v, (3, 2, 0, 1))
            elif val.ndim == 2:
                v_onnx = v.T
            else:
                v_onnx = v
            onnx_tensors[f"p_{i}.w_0"] = np.ascontiguousarray(v_onnx)

        blob = encode_test_onnx(onnx_tensors)
        loaded = read_onnx_initializers(blob)
        rep = match_by_shape(loaded, params)
        assert not rep.missing and len(rep.mapped) == 6
        # values actually landed (converted back to flax layout)
        flat_after = dict(flatten_params(params))
        # flax orders leaves alphabetically: p_0 is c1/bias, p_1 c1/kernel
        v1 = loaded["p_1.w_0"]
        assert np.allclose(flat_after["c1/kernel"],
                           np.transpose(v1, (2, 3, 1, 0)))
