"""Convert reference (torch) checkpoints to flax orbax params.

Usage:
  python tools/convert_weights.py --model db_resnet18 \
      --checkpoint /path/pytorch_model.pt [--out <dir>]

Converted weights land in the model cache (models/registry.weights_dir) so
tasks pick them up automatically; absent --out overrides that.
Supported: db_resnet18 / db_resnet50 (more converters land per model as
name maps are validated against real checkpoints; the layer-parity harness
is tests/test_convert.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
    from pdf_table_tpu.engine.params import init_params, save_params
    from pdf_table_tpu.models.registry import get_config, weights_dir

    src = TorchTensorSource(args.checkpoint)

    if args.model in ("db_resnet18", "db_resnet50"):
        import jax.numpy as jnp

        from pdf_table_tpu.convert.dbnet_convert import convert_dbnet
        from pdf_table_tpu.models.dbnet import DBNet

        depth = int(args.model[-2:])
        cfg = get_config("detection", args.model)
        model = DBNet(cfg)
        variables = jax.tree.map(
            np.asarray,
            dict(init_params(model, jnp.zeros((1, 64, 64, 3)))))
        rep = convert_dbnet(src, variables, depth=depth)
        out_dir = args.out or weights_dir("detection", args.model)
        print("conversion:", rep.summary())
        if not rep.ok:
            print("MISSING:", rep.missing[:10])
            print("SHAPE:", rep.shape_errors[:10])
            return 1
        save_params(variables, out_dir)
        print("saved to", out_dir)
        return 0

    if args.model.startswith("lore"):
        import jax.numpy as jnp

        from pdf_table_tpu.convert.lore_convert import (
            convert_lore_detector, convert_lore_processor)
        from pdf_table_tpu.models.lore import LoreModel

        task_type = args.model.split("_", 1)[1] if "_" in args.model \
            else "wtw"
        cfg = get_config("table_structure", "Lore", task_type=task_type)
        model = LoreModel(cfg)
        variables = jax.tree.map(
            np.asarray,
            dict(init_params(model, jnp.zeros((1, *cfg.resolution, 3)))))
        rep1 = convert_lore_detector(src, variables, cfg.hidden_size)
        # processor may live in the same checkpoint under 'processor', or in
        # a sibling processor_best.pth
        proc_path = args.checkpoint.replace("model_best", "processor_best")
        proc_src = src if any("tsfm_axis" in k for k in src.keys()) \
            else TorchTensorSource(proc_path)
        rep2 = convert_lore_processor(proc_src, variables,
                                      cfg.tsfm_layers, cfg.stacking_layers)
        print("detector:", rep1.summary())
        print("processor:", rep2.summary())
        if not (rep1.ok and rep2.ok):
            print("MISSING:", (rep1.missing + rep2.missing)[:10])
            print("SHAPE:", (rep1.shape_errors + rep2.shape_errors)[:10])
            return 1
        out_dir = args.out or weights_dir("table_structure", "Lore",
                                          task_type)
        save_params(variables, out_dir)
        print("saved to", out_dir)
        return 0

    if args.model == "crnn":
        import jax.numpy as jnp

        from pdf_table_tpu.convert.crnn_convert import convert_crnn
        from pdf_table_tpu.models.rec_ctc import CTCRecModel, RecConfig

        # reference vocab: 7644 entries (modeling_crnn.py:90)
        cfg = RecConfig.crnn(vocab_size=7644, hidden_size=256)
        model = CTCRecModel(cfg)
        variables = jax.tree.map(
            np.asarray,
            dict(init_params(model, jnp.zeros((1, 32, 48, 3)))))
        rep = convert_crnn(src, variables)
        print("conversion:", rep.summary())
        if not rep.ok:
            print("MISSING:", rep.missing[:10])
            return 1
        out_dir = args.out or weights_dir("recognition", "CRNN")
        save_params(variables, out_dir)
        print("saved to", out_dir)
        return 0

    if args.model == "convnext_vit":
        import jax.numpy as jnp

        from pdf_table_tpu.convert.convnext_convert import \
            convert_convnext_vit
        from pdf_table_tpu.models.rec_ctc import CTCRecModel, RecConfig

        # reference vocab: 7644 entries (modeling_convnext_vit.py:33)
        cfg = RecConfig.convnext_vit(vocab_size=7644)
        model = CTCRecModel(cfg)
        variables = jax.tree.map(
            np.asarray,
            dict(init_params(model, jnp.zeros((1, 32, 300, 1)))))
        rep = convert_convnext_vit(src, variables)
        print("conversion:", rep.summary())
        if not rep.ok:
            print("MISSING:", rep.missing[:10])
            print("SHAPE:", rep.shape_errors[:10])
            return 1
        out_dir = args.out or weights_dir("recognition", "ConvNextViT")
        save_params(variables, out_dir)
        print("saved to", out_dir)
        return 0

    if args.model in ("table_master", "mtl_tabnet"):
        import jax.numpy as jnp

        from pdf_table_tpu.convert.master_convert import convert_table_master
        from pdf_table_tpu.models.table_master import (TableMaster,
                                                       TableMasterConfig)

        # PubTabNet structure alphabet + unknown/sos/eos/pad -> 43; cell
        # textline alphabet -> 281 (mtl_tabnet_constants.py); td tag ids
        # 2='<td></td>', 8='<td' (master_convertor.idx_tag_cell:547)
        kw = dict(cell_vocab_size=281, td_token_ids=(2, 8)) \
            if args.model == "mtl_tabnet" else {}
        cfg = TableMasterConfig(variant=args.model, vocab_size=43, **kw)
        model = TableMaster(cfg)
        variables = jax.tree.map(
            np.asarray,
            dict(init_params(model, jnp.zeros((1, *cfg.img_size, 3)))))
        rep = convert_table_master(src, variables,
                                   n_layers=cfg.decoder_layers)
        print("conversion:", rep.summary())
        if not rep.ok:
            print("MISSING:", rep.missing[:10])
            print("SHAPE:", rep.shape_errors[:10])
            return 1
        name = "MtlTabNet" if args.model == "mtl_tabnet" else "TableMaster"
        out_dir = args.out or weights_dir("table_structure", name)
        save_params(variables, out_dir)
        print("saved to", out_dir)
        return 0

    print(f"no converter for {args.model!r} yet; available: db_resnet18, "
          f"db_resnet50, lore_wtw, lore_wireless, crnn, convnext_vit, table_master, "
          f"mtl_tabnet")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
