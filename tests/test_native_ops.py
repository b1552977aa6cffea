"""Native C++ op references vs JAX implementations (parity oracles)."""

import numpy as np
import pytest


class TestDeformConvParity:
    def test_cpp_matches_jax(self):
        from pdf_table_tpu.ops.deform_conv import deform_conv2d
        from pdf_table_tpu.ops.native_ref import deform_conv2d_cpu

        rng = np.random.default_rng(0)
        B, H, W, Cin, Cout = 2, 9, 11, 4, 6
        x = rng.normal(size=(B, H, W, Cin)).astype(np.float32)
        off = (rng.normal(size=(B, H, W, 18)) * 1.5).astype(np.float32)
        mask = rng.uniform(0, 1, (B, H, W, 9)).astype(np.float32)
        w = rng.normal(size=(3, 3, Cin, Cout)).astype(np.float32)
        b = rng.normal(size=(Cout,)).astype(np.float32)
        ref = deform_conv2d_cpu(x, off, mask, w, b)
        out = np.asarray(deform_conv2d(x, off, mask, w, b))
        assert np.abs(ref - out).max() < 1e-4

    def test_strided(self):
        from pdf_table_tpu.ops.deform_conv import deform_conv2d
        from pdf_table_tpu.ops.native_ref import deform_conv2d_cpu

        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 12, 12, 3)).astype(np.float32)
        off = np.zeros((1, 6, 6, 18), np.float32)
        mask = np.ones((1, 6, 6, 9), np.float32)
        w = rng.normal(size=(3, 3, 3, 5)).astype(np.float32)
        ref = deform_conv2d_cpu(x, off, mask, w, stride=(2, 2))
        out = np.asarray(deform_conv2d(x, off, mask, w, stride=(2, 2)))
        assert ref.shape == out.shape == (1, 6, 6, 5)
        assert np.abs(ref - out).max() < 1e-4
