"""LGPMA + RoIAlign tests (tiny shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestRoiAlign:
    def test_constant_region(self):
        from pdf_table_tpu.ops.roi_align import roi_align

        feat = jnp.zeros((16, 16, 2))
        feat = feat.at[4:8, 4:8, 0].set(1.0)
        out = roi_align(feat, jnp.array([[4.0, 4.0, 8.0, 8.0]]), out_size=4)
        assert out.shape == (1, 4, 4, 2)
        assert float(np.asarray(out)[0, 1:3, 1:3, 0].mean()) > 0.8

    def test_gradient_flows(self):
        from pdf_table_tpu.ops.roi_align import roi_align

        def f(feat):
            return roi_align(feat, jnp.array([[1.0, 1.0, 6.0, 6.0]]),
                             out_size=2).sum()

        g = jax.grad(f)(jnp.ones((8, 8, 1)))
        assert float(jnp.abs(g).sum()) > 0


class TestLGPMA:
    def _cfg(self):
        from pdf_table_tpu.models.lgpma import LgpmaConfig

        return LgpmaConfig(backbone_depth=18, fpn_channels=32,
                           num_proposals=16, fc_dim=64, max_side=64)

    def test_forward_shapes(self):
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.lgpma import LGPMA

        cfg = self._cfg()
        model = LGPMA(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        assert out["boxes"].shape == (1, 16, 4)
        assert out["scores"].shape == (1, 16)
        assert out["lpma_masks"].shape == (1, 16, 28, 28, 3)
        assert out["gpma_masks"].shape[-1] == 3

    def test_tsr_task_lgpma(self):
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        task = OcrTableStructureTask(
            model="Lgpma", backbone_depth=18, fpn_channels=32,
            num_proposals=16, fc_dim=64, max_side=64, score_thresh=0.0)
        img = np.full((80, 60, 3), 255, np.uint8)
        out = task(img)
        assert out["type"] == "lgpma"
        for c in out["cells"]:
            assert "logic" in c
