"""ConvNextViT recognizer conversion: numeric parity against a torch
mirror built from HF transformers parts, wired exactly like the reference
(modeling_convnext_vit.py: modified (2,1)-stride ConvNext stages + ViTForSTR
with the cls position row sliced off)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

DEPTHS = (1, 1, 1, 1)
HIDDEN = (8, 12, 16, 24)
VDIM, VLAYERS, VHEADS, V = 12, 2, 2, 11
H, W = 32, 20
TOKENS = W // 4


def build_torch_mirror():
    from transformers import ConvNextConfig, ViTConfig, ViTModel
    from transformers.models.convnext.modeling_convnext import (
        ConvNextEmbeddings, ConvNextStage)

    ccfg = ConvNextConfig(num_channels=1, depths=list(DEPTHS),
                          hidden_sizes=list(HIDDEN))
    m = tnn.Module()
    m.cnn_model = tnn.Module()
    m.cnn_model.embeddings = ConvNextEmbeddings(ccfg)
    m.cnn_model.encoder = tnn.Module()
    m.cnn_model.encoder.stages = tnn.ModuleList()
    prev = HIDDEN[0]
    for i, c in enumerate(HIDDEN):
        m.cnn_model.encoder.stages.append(ConvNextStage(
            ccfg, in_channels=prev, out_channels=c, kernel_size=(2, 1),
            stride=(2, 1) if i > 0 else 1, depth=DEPTHS[i]))
        prev = c
    vcfg = ViTConfig(patch_size=1, num_channels=HIDDEN[-1],
                     hidden_size=VDIM, num_attention_heads=VHEADS,
                     intermediate_size=4 * VDIM, image_size=[1, TOKENS],
                     num_hidden_layers=VLAYERS, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    m.vitstr = tnn.Module()
    m.vitstr.vit = ViTModel(vcfg, add_pooling_layer=False)
    m.vitstr.classifier = tnn.Linear(VDIM, V)
    return m


def torch_forward(m, x):
    """Reference forward path (ConvNextViT.forward + ViTForSTR
    .forward_features): gray conv stages -> ViT tokens + pos[1:]."""
    h = m.cnn_model.embeddings(x)
    for stage in m.cnn_model.encoder.stages:
        h = stage(h)
    emb = m.vitstr.vit.embeddings.patch_embeddings(h)
    emb = emb + m.vitstr.vit.embeddings.position_embeddings[:, 1:, :]
    enc = m.vitstr.vit.encoder(emb)
    enc = enc[0] if isinstance(enc, tuple) else enc.last_hidden_state
    return m.vitstr.classifier(m.vitstr.vit.layernorm(enc))


class TestConvNextConvert:
    def test_full_model_parity(self):
        from pdf_table_tpu.convert.convnext_convert import \
            convert_convnext_vit
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.rec_ctc import CTCRecModel, RecConfig

        torch.manual_seed(0)
        tm = build_torch_mirror().eval()
        with torch.no_grad():   # randomize LN affines for a stronger test
            for name, p in tm.named_parameters():
                if "layernorm" in name or "layer_scale" in name:
                    p.add_(torch.randn_like(p) * 0.05)
        state = dict(tm.state_dict())

        cfg = RecConfig.convnext_vit(
            vocab_size=V, convnext_depths=DEPTHS, convnext_hidden=HIDDEN,
            vit_dim=VDIM, vit_layers=VLAYERS, vit_heads=VHEADS,
            vit_pos_len=TOKENS, img_width=W, width_buckets=(W,))
        model = CTCRecModel(cfg)
        x = np.random.default_rng(1).normal(0, 1, (2, H, W, 1)) \
            .astype(np.float32)
        variables = jax.tree_util.tree_map(
            np.asarray, dict(init_params(model, jnp.asarray(x))))
        rep = convert_convnext_vit(TorchTensorSource(state), variables,
                                   depths=DEPTHS)
        assert rep.ok, (rep.missing[:8], rep.shape_errors[:8])

        with torch.no_grad():
            want = torch_forward(
                tm, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(x),
                                     train=False))
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-4), \
            np.abs(got - want).max()
