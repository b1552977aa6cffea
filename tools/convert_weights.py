"""Convert reference checkpoints (torch .pt/.pth or Paddle-exported .onnx)
to flax orbax params.

Usage:
  python tools/convert_weights.py --model <name> --checkpoint <file> [--out d]
  python tools/convert_weights.py --model <name> --from-hub [--variant ch]

``--from-hub`` closes the reference's name->weights chain
(TABLE_MODEL_DICT, ocr_table_model_config.py:16-347 + snapshot_download,
common_utils.py:465-497): resolve the hub repo id from
pdf_table_tpu/convert/hub.py, download the snapshot (HF by default,
ModelScope with PDFTABLE_USE_MODELSCOPE_HUB=1), convert, and copy the
snapshot's dict/alphabet sidecars next to the weights — one command from
model name to ready weights. Offline it fails with an actionable error.

Converted weights land in the model cache (models/registry.weights_dir) so
tasks pick them up automatically; --out overrides the destination.

Models (torch state-dict name maps, each validated by a forward-parity
test in tests/test_*_convert.py):
  db_resnet18 db_resnet50     ModelScope DBNet         (dbnet_convert)
  pp_det                      PP-OCR db_pp detector    (db_pp_convert)
  pp_rec                      PP-OCRv3 SVTR-LCNet rec  (svtr_convert)
  crnn convnext_vit           ModelScope recognizers
  slanet                      PP-Structure SLANet TSR  (slanet_convert)
  picodet                     PP layout detector       (picodet_convert)
  pplcnet_<task_type>         PULC classifiers         (pplcnet_convert)
  lore_wtw lore_wireless      LORE TSR
  table_master mtl_tabnet     Master-family TSR
  docx_layout                 DocXLayout (DLA CenterNet)
  cycle_centernet             Cycle-CenterNet TSR

A ``.onnx`` checkpoint goes through the ordered shape matcher
(convert/onnx_shape_matcher.py) instead of the name map — Paddle exports
carry anonymous initializer names; review the printed report.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _variables(model, sample_shape):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdf_table_tpu.engine.params import init_params

    return jax.tree.map(
        np.asarray, dict(init_params(model, jnp.zeros(sample_shape))))


def _spec(name: str):
    """-> (task, registry_name, build(model, variables), convert(src, vars))
    for every supported model name."""
    from pdf_table_tpu.models.registry import get_config

    if name in ("db_resnet18", "db_resnet50"):
        from pdf_table_tpu.convert.dbnet_convert import convert_dbnet
        from pdf_table_tpu.models.dbnet import DBNet

        cfg = get_config("detection", name)
        return ("detection", name, DBNet(cfg), (1, 64, 64, 3),
                lambda s, v: convert_dbnet(s, v, depth=int(name[-2:])))

    if name == "db_proxylessnas":
        from pdf_table_tpu.convert.dbnas_convert import convert_dbnas
        from pdf_table_tpu.models.dbnet import DBNet

        cfg = get_config("detection", "db_proxylessnas")
        return ("detection", "db_proxylessnas", DBNet(cfg), (1, 64, 64, 3),
                convert_dbnas)

    if name == "pp_det":
        from pdf_table_tpu.convert.db_pp_convert import convert_db_pp
        from pdf_table_tpu.models.dbnet import DBNet

        cfg = get_config("detection", "PP-OCRv4_det")
        return ("detection", "PP-OCRv4_det", DBNet(cfg), (1, 64, 64, 3),
                convert_db_pp)

    if name == "pp_rec":
        from pdf_table_tpu.convert.svtr_convert import convert_svtr_lcnet
        from pdf_table_tpu.models.rec_ctc import CTCRecModel

        cfg = get_config("recognition", "PP-OCRv4_rec")
        return ("recognition", "PP-OCRv4_rec", CTCRecModel(cfg),
                (1, 48, 320, 3), convert_svtr_lcnet)

    if name == "crnn":
        from pdf_table_tpu.convert.crnn_convert import convert_crnn
        from pdf_table_tpu.models.rec_ctc import CTCRecModel, RecConfig

        # reference vocab: 7644 entries (modeling_crnn.py:90)
        cfg = RecConfig.crnn(vocab_size=7644, hidden_size=256)
        return ("recognition", "CRNN", CTCRecModel(cfg), (1, 32, 48, 3),
                convert_crnn)

    if name == "convnext_vit":
        from pdf_table_tpu.convert.convnext_convert import convert_convnext_vit
        from pdf_table_tpu.models.rec_ctc import CTCRecModel, RecConfig

        cfg = RecConfig.convnext_vit(vocab_size=7644)
        return ("recognition", "ConvNextViT", CTCRecModel(cfg),
                (1, 32, 300, 1), convert_convnext_vit)

    if name == "slanet":
        from pdf_table_tpu.convert.slanet_convert import convert_slanet
        from pdf_table_tpu.models.slanet import SLANet

        cfg = get_config("table_structure", "SLANet")
        return ("table_structure", "SLANet", SLANet(cfg),
                (1, cfg.table_max_len, cfg.table_max_len, 3), convert_slanet)

    if name == "picodet":
        from pdf_table_tpu.convert.picodet_convert import convert_picodet
        from pdf_table_tpu.models.picodet import PicoDet

        cfg = get_config("layout", "picodet")
        return ("layout", "picodet", PicoDet(cfg), (1, 128, 128, 3),
                lambda s, v: convert_picodet(
                    s, v, num_levels=len(cfg.strides),
                    head_convs=cfg.head_convs))

    if name.startswith("pplcnet"):
        from pdf_table_tpu.convert.pplcnet_convert import convert_pplcnet
        from pdf_table_tpu.models.cls import PPLCNetClassifier

        task_type = name.split("_", 1)[1] if "_" in name \
            else "text_image_orientation"
        cfg = get_config("cls", "PPLCNet", task_type=task_type)
        return ("cls", f"PPLCNet_{task_type}", PPLCNetClassifier(cfg),
                (1, *cfg.img_size, 3), convert_pplcnet)

    if name.startswith("lore"):
        from pdf_table_tpu.convert.lore_convert import (
            convert_lore_detector, convert_lore_processor)
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.models.lore import LoreModel

        task_type = name.split("_", 1)[1] if "_" in name else "wtw"
        cfg = get_config("table_structure", "Lore", task_type=task_type)

        def conv(src, variables, _cfg=cfg):
            rep = convert_lore_detector(src, variables, _cfg.hidden_size)
            # processor may live in the same checkpoint, or in a sibling
            # processor_best.pth
            proc_src = src
            if not any("tsfm_axis" in k for k in src.keys()):
                proc_src = TorchTensorSource(
                    conv.checkpoint.replace("model_best", "processor_best"))
            rep2 = convert_lore_processor(proc_src, variables,
                                          _cfg.tsfm_layers,
                                          _cfg.stacking_layers)
            rep.mapped += rep2.mapped
            rep.missing += rep2.missing
            rep.shape_errors += rep2.shape_errors
            return rep

        return ("table_structure", f"Lore_{task_type}", LoreModel(cfg),
                (1, *cfg.resolution, 3), conv)

    if name in ("table_master", "mtl_tabnet"):
        from pdf_table_tpu.convert.master_convert import convert_table_master
        from pdf_table_tpu.models.table_master import (TableMaster,
                                                       TableMasterConfig)

        # PubTabNet structure alphabet + unknown/sos/eos/pad -> 43; cell
        # textline alphabet -> 281 (mtl_tabnet_constants.py); td tag ids
        # 2='<td></td>', 8='<td' (master_convertor.idx_tag_cell:547)
        kw = dict(cell_vocab_size=281, td_token_ids=(2, 8)) \
            if name == "mtl_tabnet" else {}
        cfg = TableMasterConfig(variant=name, vocab_size=43, **kw)
        reg = "MtlTabNet" if name == "mtl_tabnet" else "TableMaster"
        return ("table_structure", reg, TableMaster(cfg),
                (1, *cfg.img_size, 3),
                lambda s, v: convert_table_master(
                    s, v, n_layers=cfg.decoder_layers))

    if name == "docx_layout":
        from pdf_table_tpu.convert.centernet_convert import convert_docx_layout
        from pdf_table_tpu.models.docx_layout import (DocXLayoutConfig,
                                                      DocXLayoutModel)

        cfg = DocXLayoutConfig()
        return ("layout", "DocXLayout", DocXLayoutModel(cfg),
                (1, 768, 768, 3), convert_docx_layout)

    if name == "cycle_centernet":
        from pdf_table_tpu.convert.centernet_convert import \
            convert_cycle_centernet
        from pdf_table_tpu.models.center_net import (CenterNetConfig,
                                                     CycleCenterNet)

        cfg = CenterNetConfig()
        return ("table_structure", "CenterNet", CycleCenterNet(cfg),
                (1, 1024, 1024, 3), convert_cycle_centernet)

    if name == "lightweight_edge":
        from pdf_table_tpu.convert.lwe_convert import convert_lightweight_edge
        from pdf_table_tpu.models.rec_ctc import CTCRecModel

        cfg = get_config("recognition", "LightweightEdge", vocab_size=7644)
        return ("recognition", "LightweightEdge", CTCRecModel(cfg),
                (1, 32, 64, 3), convert_lightweight_edge)

    if name == "lgpma":
        from pdf_table_tpu.convert.lgpma_convert import convert_lgpma
        from pdf_table_tpu.models.lgpma import LGPMA, LgpmaConfig

        cfg = LgpmaConfig()
        return ("table_structure", "Lgpma", LGPMA(cfg), (1, 64, 64, 3),
                convert_lgpma)

    raise SystemExit(f"no converter for {name!r}; see module docstring")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--from-hub", action="store_true", dest="from_hub",
                   help="resolve + download the checkpoint from the hub "
                        "(HF; ModelScope with PDFTABLE_USE_MODELSCOPE_HUB=1)")
    p.add_argument("--variant", default="",
                   help="lang/task_type hub variant (e.g. ch, en, table)")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    if bool(args.checkpoint) == bool(args.from_hub):
        p.error("pass exactly one of --checkpoint or --from-hub")

    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.from_hub:
        from pdf_table_tpu.convert.hub import (download_snapshot,
                                               find_checkpoint,
                                               resolve_hub_id)

        repo_id = resolve_hub_id(args.model, args.variant)
        print(f"hub: {args.model}" +
              (f"[{args.variant}]" if args.variant else "") +
              f" -> {repo_id}")
        snap = download_snapshot(repo_id)
        args.checkpoint = find_checkpoint(snap)
        print("snapshot:", snap, "-> checkpoint:", args.checkpoint)

    from pdf_table_tpu.engine.params import save_params
    from pdf_table_tpu.models.registry import weights_dir

    task, reg_name, model, sample_shape, convert = _spec(args.model)
    variables = _variables(model, sample_shape)

    if args.checkpoint.endswith(".onnx"):
        import jax.numpy as jnp

        from pdf_table_tpu.convert.onnx_reader import read_onnx_initializers
        from pdf_table_tpu.convert.onnx_shape_matcher import (
            call_ordered_slots, match_by_shape_with_stats)

        tensors = read_onnx_initializers(args.checkpoint)
        # true execution-order slots (params + batch_stats interleaved):
        # Paddle exports serialize initializers in graph order
        slots = call_ordered_slots(model, jnp.zeros(sample_shape))
        rep = match_by_shape_with_stats(tensors, variables, slots)
        print(f"onnx ordered-shape match: {rep.summary()} "
              f"({len(tensors)} initializers, {len(slots)} slots)")
    else:
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource

        src = TorchTensorSource(args.checkpoint)
        convert.checkpoint = args.checkpoint  # for multi-file checkpoints
        rep = convert(src, variables)
        print("conversion:", rep.summary())
        unused = [u for u in src.unused() if "num_batches" not in u]
        if unused:
            print(f"UNUSED source tensors ({len(unused)}):", unused[:10])

    if not rep.ok:
        print("MISSING:", rep.missing[:10])
        print("SHAPE:", rep.shape_errors[:10])
        return 1

    lang = ""
    if reg_name.startswith(("PPLCNet_", "Lore_")):
        reg_name, lang = reg_name.split("_", 1)
    out_dir = args.out or weights_dir(task, reg_name, lang)
    save_params(variables, out_dir)
    print("saved to", out_dir)

    # carry the snapshot's sidecar vocab files (dict/keys/alphabet/label
    # txt) next to the converted weights — decode resolves them from the
    # weights dir first, mirroring the reference's snapshot layout
    # (rec_postprocess.py BaseRecLabelDecode:17, table_postprocess.py:177)
    import glob
    import shutil

    src_dir = os.path.dirname(os.path.abspath(args.checkpoint))
    for pth in sorted(glob.glob(os.path.join(src_dir, "*.txt"))):
        base = os.path.basename(pth).lower()
        if any(k in base for k in ("dict", "keys", "alphabet", "label")):
            shutil.copy(pth, out_dir)
            print("copied sidecar", os.path.basename(pth))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
