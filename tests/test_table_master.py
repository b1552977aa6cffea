"""TableMaster / MtlTabNet tests (tiny shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def tiny_cfg(**kw):
    from pdf_table_tpu.models.table_master import TableMasterConfig

    base = dict(img_size=(64, 64), d_model=32, decoder_layers=1, heads=4,
                ff_dim=64, max_structure_len=6)
    base.update(kw)
    return TableMasterConfig(**base)


class TestTableMaster:
    def test_forward_shapes(self):
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.slanet.vocab import StructureVocab
        from pdf_table_tpu.models.table_master import TableMaster

        cfg = tiny_cfg()
        model = TableMaster(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        V = len(StructureVocab())
        assert out["structure_probs"].shape == (1, 6, V)
        assert out["loc_preds"].shape == (1, 6, 4)
        p = np.asarray(out["structure_probs"])
        assert np.allclose(p.sum(-1), 1.0, atol=1e-4)

    def test_postprocessor_and_matcher(self):
        from pdf_table_tpu.models.slanet.vocab import StructureVocab
        from pdf_table_tpu.models.table_master import (TableMasterConfig,
                                                       TableMasterPostProcessor)

        v = StructureVocab()
        cfg = tiny_cfg()
        post = TableMasterPostProcessor(cfg)
        T, V = 6, len(v)
        probs = np.zeros((T, V), np.float32)
        seq = ["<tr>", "<td></td>", "</tr>"]
        for t, tok in enumerate(seq):
            probs[t, v.token_to_id[tok]] = 1.0
        probs[len(seq):, v.eos_id] = 1.0
        locs = np.full((T, 4), 0.25, np.float32)
        out = post({"structure_probs": probs[None], "loc_preds": locs[None]},
                   {"shape_list": (100, 200, 1, 1, 0, 0)})
        assert out["type"] == "master"
        assert out["structure_tokens"] == seq
        assert out["cells"][0]["bbox"] == [50.0, 25.0, 50.0, 25.0]

    def test_tsr_task_master(self):
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        task = OcrTableStructureTask(
            model="TableMaster", img_size=(64, 64), d_model=32,
            decoder_layers=1, heads=4, ff_dim=64, max_structure_len=4)
        img = np.full((80, 60, 3), 255, np.uint8)
        out = task(img)
        assert out["type"] == "master"

    def test_mtl_tabnet_variant(self):
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        task = OcrTableStructureTask(
            model="MtlTabNet", img_size=(64, 64), d_model=32,
            decoder_layers=1, heads=4, ff_dim=64, max_structure_len=4)
        assert task.model_config.variant == "mtl_tabnet"
