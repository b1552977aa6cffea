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


class TestWideGatherVariant:
    """PDFTABLE_DCN_WIDE_GATHER=1: the 1KB-row paired gather with
    parity-zeroed blend slots must match the quad-gather path exactly
    (the flag only changes memory access, not math)."""

    def test_wide_matches_base(self, monkeypatch):
        import jax.numpy as jnp

        import pdf_table_tpu.ops.deform_conv as dc

        rng = np.random.default_rng(5)
        B, H, W, C, Co = 2, 12, 10, 8, 6
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        off = (rng.standard_normal((B, H, W, 18)) * 2).astype(np.float32)
        mask = rng.random((B, H, W, 9)).astype(np.float32)
        wgt = rng.standard_normal((3, 3, C, Co)).astype(np.float32)

        base = np.asarray(dc.deform_conv2d(x, off, mask, wgt))
        monkeypatch.setenv("PDFTABLE_DCN_WIDE_GATHER", "1")
        dc.deform_conv2d.clear_cache()
        wide = np.asarray(dc.deform_conv2d(x, off, mask, wgt))
        dc.deform_conv2d.clear_cache()
        np.testing.assert_allclose(wide, base, rtol=1e-5, atol=1e-5)

        # bf16 inputs too (the production dtype)
        xb = jnp.asarray(x, jnp.bfloat16)
        monkeypatch.setenv("PDFTABLE_DCN_WIDE_GATHER", "0")
        dc.deform_conv2d.clear_cache()
        base_b = np.asarray(dc.deform_conv2d(xb, off, mask, wgt))
        monkeypatch.setenv("PDFTABLE_DCN_WIDE_GATHER", "1")
        dc.deform_conv2d.clear_cache()
        wide_b = np.asarray(dc.deform_conv2d(xb, off, mask, wgt))
        dc.deform_conv2d.clear_cache()
        np.testing.assert_allclose(wide_b, base_b, rtol=1e-3, atol=1e-3)

    def test_odd_width_falls_back(self, monkeypatch):
        import pdf_table_tpu.ops.deform_conv as dc

        rng = np.random.default_rng(6)
        x = rng.standard_normal((1, 6, 7, 4)).astype(np.float32)
        off = rng.standard_normal((1, 6, 7, 18)).astype(np.float32)
        mask = rng.random((1, 6, 7, 9)).astype(np.float32)
        wgt = rng.standard_normal((3, 3, 4, 4)).astype(np.float32)
        base = np.asarray(dc.deform_conv2d(x, off, mask, wgt))
        monkeypatch.setenv("PDFTABLE_DCN_WIDE_GATHER", "1")
        dc.deform_conv2d.clear_cache()
        wide = np.asarray(dc.deform_conv2d(x, off, mask, wgt))
        dc.deform_conv2d.clear_cache()
        np.testing.assert_allclose(wide, base, rtol=1e-5, atol=1e-5)
