"""SLANet model + structure vocab + TableMatch tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestVocab:
    def test_roundtrip_and_specials(self):
        from pdf_table_tpu.models.slanet import StructureVocab

        v = StructureVocab()
        assert v.tokens[0] == "sos" and v.tokens[-1] == "eos"
        ids = [v.token_to_id["<tr>"], v.token_to_id["<td></td>"],
               v.token_to_id["</tr>"], v.eos_id, v.token_to_id["<tr>"]]
        assert v.decode(ids) == ["<tr>", "<td></td>", "</tr>"]  # stops at eos

    def test_dict_file(self, tmp_path):
        from pdf_table_tpu.models.slanet import StructureVocab

        p = tmp_path / "dict.txt"
        p.write_text("<tr>\n</tr>\n<td>\n</td>\n")
        v = StructureVocab.from_dict_file(str(p))
        assert "<td></td>" in v.tokens and "<td>" not in v.tokens[1:-1]


class TestSLANetModel:
    def test_forward_shapes(self):
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.slanet import SLANet, SLANetConfig

        cfg = SLANetConfig(table_max_len=64, hidden_size=32,
                           max_structure_len=8)
        model = SLANet(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        T = cfg.max_structure_len
        from pdf_table_tpu.models.slanet.vocab import StructureVocab
        V = len(StructureVocab())
        assert out["structure_probs"].shape == (1, T, V)
        assert out["loc_preds"].shape == (1, T, 8)
        p = np.asarray(out["structure_probs"])
        assert np.allclose(p.sum(-1), 1.0, atol=1e-4)
        locs = np.asarray(out["loc_preds"])
        assert (locs >= 0).all() and (locs <= 1).all()

    def test_postprocessor(self):
        from pdf_table_tpu.models.slanet import (SLANetConfig,
                                                 SLANetPostProcessor)
        from pdf_table_tpu.models.slanet.vocab import StructureVocab

        v = StructureVocab()
        cfg = SLANetConfig(max_structure_len=8)
        post = SLANetPostProcessor(cfg)
        T, V = 8, len(v)
        probs = np.zeros((T, V), np.float32)
        seq = ["<tr>", "<td></td>", "<td></td>", "</tr>"]
        for t, tok in enumerate(seq):
            probs[t, v.token_to_id[tok]] = 1.0
        probs[len(seq), v.eos_id] = 1.0
        probs[len(seq) + 1:, v.token_to_id["<tr>"]] = 1.0  # after eos: ignored
        locs = np.full((T, 8), 0.5, np.float32)
        out = post({"structure_probs": probs[None], "loc_preds": locs[None]},
                   (100, 200, 1.0, 1.0, 0, 0))
        assert out["structure_tokens"] == seq
        assert len(out["cells"]) == 2
        assert out["cells"][0]["bbox"] == [100.0, 50.0, 100.0, 50.0]


class TestTableMatch:
    def test_match_and_html(self):
        from pdf_table_tpu.tasks.table_matcher import TableMatch

        tokens = ["<table>", "<tr>", "<td></td>", "<td></td>", "</tr>",
                  "</table>"]
        pred_bboxes = [[0, 0, 50, 20], [50, 0, 100, 20]]
        dt_boxes = [[2, 2, 48, 18], [52, 2, 98, 18]]
        texts = ["left", "right"]
        html = TableMatch()(tokens, pred_bboxes, dt_boxes, texts)
        assert html == ("<table><tr><td>left</td><td>right</td></tr>"
                        "</table>")

    def test_multi_text_per_cell(self):
        from pdf_table_tpu.tasks.table_matcher import TableMatch

        tokens = ["<tr>", "<td></td>", "</tr>"]
        html = TableMatch()(tokens, [[0, 0, 100, 20]],
                            [[0, 0, 40, 20], [45, 0, 90, 20]], ["a", "b"])
        assert "<td>a b</td>" in html

    def test_tsr_task_slanet(self):
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        task = OcrTableStructureTask(model="SLANet", table_max_len=64,
                                     hidden_size=32, max_structure_len=6)
        img = np.full((80, 60, 3), 255, np.uint8)
        out = task(img)
        assert "structure_tokens" in out and "cells" in out

    def test_token_path_html(self):
        from pdf_table_tpu.entity.ocr_cell import OcrCell
        from pdf_table_tpu.tasks.table_to_html import OcrTableToHtmlTask

        tsr = {"structure_tokens": ["<tr>", "<td></td>", "</tr>"],
               "cells": [{"bbox": [0, 0, 60, 20]}],
               "type": "slanet", "offset": (0, 0)}
        cells = [OcrCell.from_bbox((5, 2, 55, 18), text="hello")]
        html = OcrTableToHtmlTask()(tsr, cells)
        assert "<td>hello</td>" in html


class TestTeacherForcing:
    def test_teacher_tokens_shapes_and_training(self):
        import jax
        import jax.numpy as jnp
        import optax

        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.slanet import SLANet, SLANetConfig

        cfg = SLANetConfig(table_max_len=64, hidden_size=32,
                           max_structure_len=6)
        m = SLANet(cfg)
        x = jnp.zeros((1, 64, 64, 3))
        v = dict(init_params(m, x))
        toks = jnp.array([[1, 7, 8, 30, 49, 49]], jnp.int32)
        out = m.apply(v, x, train=False, teacher_tokens=toks)
        assert out["structure_probs"].shape[1] == 6

        tx = optax.adam(3e-3)
        p = v["params"]
        opt = tx.init(p)

        @jax.jit
        def step(p, opt):
            def loss_fn(pp):
                vv = {"params": pp}
                if "batch_stats" in v:
                    vv["batch_stats"] = v["batch_stats"]
                o = m.apply(vv, x, train=False, teacher_tokens=toks)
                logp = jnp.log(o["structure_probs"] + 1e-9)
                return -jnp.take_along_axis(
                    logp, toks[..., None], -1).mean()

            l, g = jax.value_and_grad(loss_fn)(p)
            up, opt = tx.update(g, opt, p)
            return optax.apply_updates(p, up), opt, l

        l0 = None
        for _ in range(20):
            p, opt, l = step(p, opt)
            l0 = l0 if l0 is not None else float(l)
        assert float(l) < l0 * 0.7
