"""DocXLayout + Cycle-CenterNet tests (tiny shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestDocXLayout:
    def test_forward_heads(self):
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.docx_layout import (DocXLayoutConfig,
                                                      DocXLayoutModel)

        cfg = DocXLayoutConfig(resolution=(64, 64), head_conv=16)
        model = DocXLayoutModel(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        assert out["hm"].shape == (1, 16, 16, 11)
        assert out["wh"].shape == (1, 16, 16, 8)
        assert out["hm_sub"].shape == (1, 16, 16, 2)

    def test_pnms(self):
        from pdf_table_tpu.models.docx_layout.processor import pnms

        dets = np.array([
            [0, 0, 10, 0, 10, 10, 0, 10, 0.9],
            [1, 1, 11, 1, 11, 11, 1, 11, 0.8],   # overlaps first
            [50, 50, 60, 50, 60, 60, 50, 60, 0.7],
        ])
        keep = pnms(dets, 0.3)
        assert 0 in keep and 2 in keep and 1 not in keep

    def test_layout_task_docx(self):
        from pdf_table_tpu.tasks.layout import OcrLayoutTask

        task = OcrLayoutTask(model="DocXLayout", resolution=(64, 64),
                             head_conv=16, top_k=10)
        img = np.full((100, 80, 3), 255, np.uint8)
        out = task(img)
        assert "bboxs" in out and "layout_cells" in out


class TestCycleCenterNet:
    def test_forward_decode_shapes(self):
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.center_net import (CenterNetConfig,
                                                     CycleCenterNet)

        cfg = CenterNetConfig(resolution=(64, 64), head_conv=16, K=8, MK=16)
        model = CycleCenterNet(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        assert out["dets"].shape == (1, 8, 8)
        assert out["gboxes"].shape == (1, 16, 11)

    def test_group_bbox_by_gbox_snaps(self):
        from pdf_table_tpu.models.center_net.processor import group_bbox_by_gbox

        # one cell quad, one vertex near its top-left corner pointing to its
        # center -> corner snaps to the vertex
        bboxes = np.array([[0, 0, 10, 0, 10, 10, 0, 10, 0.9]], np.float32)
        gboxes = np.array([[0.4, 0.4, 5, 5, 99, 99, 99, 99, 99, 99, 0.9]],
                          np.float32)
        out = group_bbox_by_gbox(bboxes.copy(), gboxes, score_thresh=0.3,
                                 v2c_dist=2.0, c2v_dist=0.5)
        assert out[0, 0] == pytest.approx(0.4)
        assert out[0, 1] == pytest.approx(0.4)

    def test_assign_logical_coords(self):
        from pdf_table_tpu.models.center_net.processor import assign_logical_coords

        cells = [
            {"bbox": [0, 0, 50, 20]},
            {"bbox": [50, 0, 100, 20]},
            {"bbox": [0, 20, 100, 40]},   # full-width row -> colspan
        ]
        assign_logical_coords(cells, tol=4)
        assert cells[0]["logic"] == [0, 0, 0, 0]
        assert cells[1]["logic"] == [0, 0, 1, 1]
        assert cells[2]["logic"] == [1, 1, 0, 1]

    def test_tsr_task_centernet(self):
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        task = OcrTableStructureTask(model="CenterNet", resolution=(64, 64),
                                     head_conv=16, K=8, MK=16)
        img = np.full((80, 60, 3), 255, np.uint8)
        out = task(img)
        assert out["type"] == "center_net" and "cells" in out
