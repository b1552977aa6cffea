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
        from pdf_table_tpu.models.table_master import (MasterStructureVocab,
                                                       TableMaster)

        cfg = tiny_cfg()
        model = TableMaster(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        V = len(MasterStructureVocab())
        assert V == 43  # 39 PubTabNet structure tokens + UKN/SOS/EOS/PAD
        assert out["structure_probs"].shape == (1, 6, V)
        assert out["loc_preds"].shape == (1, 6, 4)
        p = np.asarray(out["structure_probs"])
        assert np.allclose(p.sum(-1), 1.0, atol=1e-4)

    def test_postprocessor_and_matcher(self):
        from pdf_table_tpu.models.table_master import (
            MasterStructureVocab, TableMasterConfig, TableMasterPostProcessor)

        v = MasterStructureVocab()
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
                   {"shape_list": (128, 128, 0.5, 0.5, 64, 64)})
        assert out["type"] == "master"
        assert out["structure_tokens"] == seq
        # xywh 0.25 on the 64-pad canvas -> center (16,16) w=h=16, /0.5
        # ratio -> center (32,32) extents 32//2=16 -> [16,16,48,48]
        assert out["cells"][0]["bbox"] == [16.0, 16.0, 48.0, 48.0]

    def test_postprocessor_eb_tokens_survive_decode(self):
        """eb tokens decode as structure tokens without bboxes; the master
        matcher later rewrites them to empty-cell HTML."""
        from pdf_table_tpu.models.table_master import (
            MasterStructureVocab, TableMasterConfig, TableMasterPostProcessor)

        v = MasterStructureVocab()
        cfg = tiny_cfg()
        post = TableMasterPostProcessor(cfg)
        T, V = 6, len(v)
        probs = np.zeros((T, V), np.float32)
        seq = ["<tr>", "<td></td>", "<eb></eb>", "</tr>"]
        for t, tok in enumerate(seq):
            probs[t, v.token_to_id[tok]] = 1.0
        probs[len(seq):, v.eos_id] = 1.0
        locs = np.full((T, 4), 0.25, np.float32)
        out = post({"structure_probs": probs[None], "loc_preds": locs[None]},
                   {"shape_list": (64, 64, 1.0, 1.0, 64, 64)})
        assert out["structure_tokens"] == seq
        assert len(out["cells"]) == 1  # only the td carries a bbox

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

    def test_teacher_forced_training_learns(self):
        """Teacher-forced CE through the scan decoder decreases — the
        reference's forward_train analog (master_decoder.py:493). BN runs
        in batch mode (train=True) like the reference trainer: the 20-conv
        encoder is not stable under frozen init statistics."""
        import optax

        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.table_master import (MasterStructureVocab,
                                                       TableMaster)

        cfg = tiny_cfg(decoder_layers=2)
        model = TableMaster(cfg)
        v = MasterStructureVocab()
        x = np.random.default_rng(0).normal(
            0, 1, (2, 64, 64, 3)).astype(np.float32)
        ids = np.tile(np.array([v.token_to_id["<tr>"],
                                v.token_to_id["<td></td>"],
                                v.token_to_id["</tr>"], v.eos_id,
                                v.eos_id, v.eos_id], np.int32), (2, 1))
        variables = dict(init_params(model, jnp.zeros((2, 64, 64, 3))))
        params = variables.pop("params")
        bstats = variables["batch_stats"]
        tx = optax.adam(2e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, bstats, opt):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": bstats},
                    jnp.asarray(x), train=True,
                    teacher_tokens=jnp.asarray(ids),
                    mutable=["batch_stats"])
                logp = jnp.log(out["structure_probs"] + 1e-9)
                loss = -jnp.take_along_axis(
                    logp, jnp.asarray(ids)[..., None], -1).mean()
                return loss, mut["batch_stats"]
            (loss, bs), g = jax.value_and_grad(loss_fn,
                                               has_aux=True)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), bs, opt, loss

        losses = []
        for _ in range(8):
            params, bstats, opt, loss = step(params, bstats, opt)
            losses.append(float(loss))
        assert np.isfinite(losses).all(), losses
        assert losses[-1] < losses[0] * 0.8, losses
