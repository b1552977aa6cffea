"""bf16 inference path: every model family threads ``dtype`` through its
modules (the TPU MXU-native precision; reference runs fp16 via
deploy_utils.py:227-264). Tiny shapes; checks compile + finite outputs and
that fp32 vs bf16 results agree to bf16 tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _init_apply(model, x):
    from pdf_table_tpu.engine.params import init_params

    variables = init_params(model, x)
    return model.apply(variables, x, train=False)


class TestBf16:
    def test_dbnet_bf16(self):
        from pdf_table_tpu.models.dbnet import DBNet, DbNetConfig

        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        outs = {}
        for dt in ("float32", "bfloat16"):
            cfg = DbNetConfig(backbone="resnet18", dtype=dt)
            out = _init_apply(DBNet(cfg), x)
            prob = np.asarray(out["prob"], np.float32)
            assert np.isfinite(prob).all()
            outs[dt] = prob
        # same seed-0 init -> bf16 must track fp32 within rounding
        assert np.allclose(outs["float32"], outs["bfloat16"], atol=2e-2)

    def test_rec_bf16(self):
        from pdf_table_tpu.models.rec_ctc import CTCRecModel, RecConfig

        x = jnp.zeros((1, 48, 80, 3), jnp.float32)
        cfg = RecConfig(vocab_size=20, dtype="bfloat16")
        logits = _init_apply(CTCRecModel(cfg), x)
        assert logits.dtype == jnp.float32      # head casts back for CTC
        assert np.isfinite(np.asarray(logits)).all()

    def test_lore_bf16(self):
        from pdf_table_tpu.models.lore import LoreConfig, LoreModel

        cfg = LoreConfig(resolution=(64, 64), max_objs=8, max_corners=16,
                         hidden_size=32, head_conv=16, tsfm_layers=1,
                         stacking_layers=1, num_heads=4, d_ff=32,
                         max_fmp_size=64, backbone="resnet18",
                         dtype="bfloat16")
        out = _init_apply(LoreModel(cfg), jnp.zeros((1, 64, 64, 3)))
        assert np.isfinite(np.asarray(out["dets"], np.float32)).all()
        assert np.isfinite(np.asarray(out["logi"], np.float32)).all()

    def test_slanet_bf16(self):
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.slanet import SLANet, SLANetConfig

        cfg = SLANetConfig(table_max_len=64, hidden_size=32,
                           max_structure_len=4, dtype="bfloat16")
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        model = SLANet(cfg)
        out = model.apply(init_params(model, x), x, train=False)
        p = np.asarray(out["structure_probs"], np.float32)
        assert np.isfinite(p).all()
        assert np.allclose(p.sum(-1), 1.0, atol=3e-2)
