"""CRNN conversion: torch replica forward vs converted flax forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


class TBiLSTM(tnn.Module):
    def __init__(self, nin, nhidden, nout):
        super().__init__()
        self.rnn = tnn.LSTM(nin, nhidden, bidirectional=True)
        self.embedding = tnn.Linear(nhidden * 2, nout)

    def forward(self, x):          # (T, B, C)
        rec, _ = self.rnn(x)
        T, B, H = rec.size()
        out = self.embedding(rec.view(T * B, H))
        return out.view(T, B, -1)


def build_reference_crnn(vocab=37):
    class CRNN(tnn.Module):
        def __init__(self):
            super().__init__()
            def cb(cin, cout, k=(3, 3), p=(1, 1), s=(1, 1)):
                return [tnn.Conv2d(cin, cout, k, s, p),
                        tnn.BatchNorm2d(cout), tnn.ReLU()]
            self.conv0 = tnn.Sequential(*cb(1, 64))
            self.p0 = tnn.MaxPool2d((2, 2), (2, 2))
            self.conv1 = tnn.Sequential(*cb(64, 128))
            self.p1 = tnn.MaxPool2d((2, 2), (2, 2))
            self.conv2 = tnn.Sequential(*(cb(128, 256) + cb(256, 256)))
            self.p2 = tnn.MaxPool2d((2, 1), (2, 1))
            self.conv3 = tnn.Sequential(*(cb(256, 512) + cb(512, 512)))
            self.p3 = tnn.MaxPool2d((2, 1), (2, 1))
            self.conv4 = tnn.Sequential(*cb(512, 512, (2, 1), (0, 0), (2, 1)))
            self.rnn = tnn.Sequential(TBiLSTM(512, 256, 256),
                                      TBiLSTM(256, 256, 512))
            self.cls = tnn.Linear(512, vocab, bias=False)

        def forward(self, x):      # (B, 3, H, W)
            x = (x[:, 0:1] * 0.2989 + x[:, 1:2] * 0.5870
                 + x[:, 2:3] * 0.1140)
            f = self.p0(self.conv0(x))
            f = self.p1(self.conv1(f))
            f = self.p2(self.conv2(f))
            f = self.p3(self.conv3(f))
            f = self.conv4(f)
            b, c, h, w = f.size()
            assert h == 1
            f = f.squeeze(2).permute(2, 0, 1)     # (T, B, C)
            r = self.rnn(f)
            return self.cls(r).permute(1, 0, 2)   # (B, T, V)

    return CRNN()


class TestCrnnConvert:
    def test_numeric_parity(self):
        from pdf_table_tpu.convert.crnn_convert import convert_crnn
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.rec_ctc import CTCRecModel, RecConfig

        tm = build_reference_crnn(vocab=37)
        tm.eval()
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 3, 32, 48)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()

        cfg = RecConfig.crnn(vocab_size=37, hidden_size=256)
        model = CTCRecModel(cfg)
        # flax model takes NHWC 3ch; grayscale happens inside like torch
        variables = jax.tree.map(
            np.asarray,
            dict(init_params(model, jnp.zeros((1, 32, 48, 3)))))
        rep = convert_crnn(TorchTensorSource(tm.state_dict()), variables)
        assert rep.ok, (rep.missing[:6], rep.shape_errors[:6])
        leftovers = [k for k in
                     TorchTensorSource(tm.state_dict()).state
                     if "num_batches" in k]
        out = model.apply(jax.tree.map(jnp.asarray, variables),
                          jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        assert out.shape == ref.shape
        assert np.abs(np.asarray(out) - ref).max() < 2e-4
