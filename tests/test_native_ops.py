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


class TestPallasDcnGate:
    """blend_matmul_supported default (auto) mode: on after the v5e A/B
    only in the measured win region — bf16, aligned, kc<=2304, TPU."""

    def test_auto_mode_win_region(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        from pdf_table_tpu.ops.pallas import deform_blend as db

        monkeypatch.delenv("PDFTABLE_PALLAS_DCN", raising=False)
        on_tpu = jax.default_backend() == "tpu"
        # the stride-4 LORE shape (kc=2304) is in the win region
        assert db.blend_matmul_supported(512, 2304, 64, jnp.bfloat16) \
            == on_tpu
        # Cin=128 (kc=4608) measured a tie -> auto stays off
        assert not db.blend_matmul_supported(512, 4608, 128, jnp.bfloat16)
        # force-on extends to any fitting shape, force-off kills all
        monkeypatch.setenv("PDFTABLE_PALLAS_DCN", "1")
        assert db.blend_matmul_supported(512, 4608, 128, jnp.bfloat16) \
            == on_tpu
        # Cin=256 (kc=9216, co=256) measured a Mosaic VMEM OOM
        assert not db.blend_matmul_supported(512, 9216, 256, jnp.bfloat16)
        monkeypatch.setenv("PDFTABLE_PALLAS_DCN", "0")
        assert not db.blend_matmul_supported(512, 2304, 64, jnp.bfloat16)
