"""Model registry: (task, model_name, task_type/lang) -> config factory.

TPU-native analog of the reference's TABLE_MODEL_DICT
(model/ocr_pdf/ocr_table_model_config.py:16-347): instead of hub repo ids
resolved to downloaded torch/onnx checkpoints, entries resolve to config
factories plus an optional converted-weights directory under
``Constants.MODEL_CACHE_DIR`` (orbax checkpoints produced by the weight
converters in tools/). Missing weights -> deterministic random init, which
keeps structural tests hermetic (reference behavior requires network).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

from ..utils.constants import Constants


@dataclass(frozen=True)
class ModelKey:
    task: str           # detection | recognition | layout | table_structure | cls
    name: str           # e.g. "PP-OCRv4_det" / "db_resnet18" / "LoreModel"
    task_type: str = "" # e.g. "general" / "table" / "wtw"
    lang: str = "en"


_REGISTRY: Dict[Tuple[str, str], Callable[..., Any]] = {}


def register(task: str, name: str):
    def deco(factory):
        _REGISTRY[(task, name)] = factory
        return factory
    return deco


def get_config(task: str, name: str, **kwargs):
    key = (task, name)
    if key not in _REGISTRY:
        known = sorted(k[1] for k in _REGISTRY if k[0] == task)
        raise KeyError(f"no model {name!r} for task {task!r}; known: {known}")
    if "dtype" not in kwargs:
        # production default: bf16 compute on TPU (the MXU-native precision;
        # reference runs fp16 ONNX by default, deploy_utils.py:243-264),
        # f32 on CPU. Parity tests construct configs directly and stay f32.
        from ..engine.device import compute_dtype
        import jax.numpy as jnp

        kwargs["dtype"] = ("bfloat16" if compute_dtype() == jnp.bfloat16
                           else "float32")
    return _REGISTRY[key](**kwargs)


def list_models(task: Optional[str] = None):
    return sorted(n for (t, n) in _REGISTRY if task is None or t == task)


def weights_dir(task: str, name: str, lang: str = "") -> str:
    """Directory for converted weights (orbax) for a registry entry."""
    leaf = f"{name}_{lang}" if lang else name
    return os.path.join(Constants.MODEL_CACHE_DIR, task, leaf)


# -- registrations ----------------------------------------------------------

@register("detection", "db_resnet18")
def _db_r18(**kw):
    from .dbnet.config import DbNetConfig
    return DbNetConfig(backbone="resnet18", **kw)


@register("detection", "db_resnet50")
def _db_r50(**kw):
    from .dbnet.config import DbNetConfig
    return DbNetConfig(backbone="resnet50", **kw)


@register("detection", "db_proxylessnas")
def _db_nas(**kw):
    from .dbnet.config import DbNetConfig
    kw.setdefault("inner_channels", 64)
    return DbNetConfig(backbone="proxylessnas", **kw)


@register("detection", "PP-OCRv4_det")
def _db_pp(**kw):
    from .dbnet.config import DbNetConfig
    return DbNetConfig.ppocr(**kw)


@register("recognition", "PP-OCRv4_rec")
def _rec_pp(**kw):
    """lang-keyed like the reference's PP-OCRv4 rows
    (ocr_table_model_config.py:165-199: ch/en/korean/japan/chinese_cht/
    latin/arabic/...): the charset comes from the lang's dict file and the
    vocab sizes follow it."""
    from .rec_ctc.charset import resolve_charset
    from .rec_ctc.config import RecConfig

    lang = kw.pop("lang", "en")
    if lang != "en" and "charset_name" not in kw:
        kw["charset_name"] = lang
        kw.setdefault("vocab_size", len(resolve_charset(lang)))
    return RecConfig(backbone="svtr_lcnet", **kw)


@register("recognition", "CRNN")
def _rec_crnn(**kw):
    from .rec_ctc.config import RecConfig
    kw.pop("lang", None)   # ModelScope CRNN ships its own vocab
    return RecConfig.crnn(**kw)


@register("recognition", "ConvNextViT")
def _rec_cnv(**kw):
    from .rec_ctc.config import RecConfig
    kw.pop("lang", None)   # ModelScope ConvNextViT ships its own vocab
    return RecConfig.convnext_vit(**kw)


@register("recognition", "LightweightEdge")
def _rec_lwe(**kw):
    from .rec_ctc.config import RecConfig
    kw.pop("lang", None)   # ModelScope LightweightEdge ships its own vocab
    base = dict(backbone="lightweight_edge", img_channels=3, img_height=32,
                img_width=320)
    base.update(kw)
    return RecConfig(**base)


@register("layout", "DocXLayout")
def _layout_docx(**kw):
    from .docx_layout.config import DocXLayoutConfig
    kw.pop("task_type", None)
    return DocXLayoutConfig(**kw)


@register("layout", "picodet")
def _layout_picodet(**kw):
    from .picodet.config import PicoDetConfig
    return PicoDetConfig(**kw)


@register("table_structure", "SLANet")
def _tsr_slanet(**kw):
    from .slanet.config import SLANetConfig
    return SLANetConfig(**kw)


@register("table_structure", "Lore")
def _tsr_lore(task_type: str = "wtw", **kw):
    from .lore.config import LoreConfig
    if task_type == "wtw":
        return LoreConfig.wtw(**kw)
    if task_type == "wireless":
        return LoreConfig.wireless(**kw)
    return LoreConfig(task_type=task_type, **kw)


@register("table_structure", "CenterNet")
def _tsr_centernet(**kw):
    from .center_net.config import CenterNetConfig
    return CenterNetConfig(**kw)


@register("table_structure", "Lgpma")
def _tsr_lgpma(**kw):
    from .lgpma.config import LgpmaConfig
    return LgpmaConfig(**kw)


@register("table_structure", "TableMaster")
def _tsr_master(**kw):
    from .table_master.config import TableMasterConfig
    kw.setdefault("variant", "table_master")
    return TableMasterConfig(**kw)


@register("table_structure", "MtlTabNet")
def _tsr_mtl(**kw):
    from .table_master.config import TableMasterConfig
    kw.setdefault("variant", "mtl_tabnet")
    return TableMasterConfig(**kw)


@register("cls", "PPLCNet")
def _cls_pplcnet(task_type: str = "text_image_orientation", **kw):
    from .cls.config import ClsPulcConfig
    return ClsPulcConfig.for_task(task_type, **kw)
