"""DBNet text-detection config.

Covers both reference flavors with one implementation:
  * ModelScope "db" (resnet18/50 + SegDetector, k=50) —
    reference model/db_net/configuration_dbnet.py:46-57, dbnet.py:715.
  * PaddleOCR "db_pp" (MobileNetV3 + RSE-FPN + DB head, ONNX in the
    reference) — reference model/db_pp/processor_ocr_db_pp.py:69-172.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class DbNetConfig:
    # architecture
    backbone: str = "resnet18"      # resnet18 | resnet50 | mobilenetv3
    inner_channels: int = 256
    k: float = 50.0                 # differentiable-binarization steepness
    # preprocessing: "short" = ModelScope short-side resize to /32
    # (processor_ocr_dbnet.py:50-62); "limit" = PaddleOCR max-side limit
    # (db_pp DetResizeForTest, image_operators.py:212).
    resize_mode: str = "short"
    image_short_side: int = 736
    limit_side_len: int = 960
    limit_type: str = "max"
    # ModelScope normalization: mean-sub then /255 (processor_ocr_dbnet.py:62)
    # Paddle normalization: /255 then imagenet mean/std (db_pp list above)
    norm_style: str = "modelscope"  # modelscope | imagenet
    # postprocess (db: thresh .2/score .3/unclip 1.5 ocr_detection_utils.py:196-203;
    # db_pp: thresh .3/box .6/unclip 1.5-2.0 processor_ocr_db_pp.py:153-160)
    thresh: float = 0.2
    box_thresh: float = 0.3
    unclip_ratio: float = 1.5
    max_candidates: int = 1000
    min_size: int = 3
    return_polygon: bool = False
    # runtime
    dtype: str = "float32"

    @classmethod
    def ppocr(cls, **kw) -> "DbNetConfig":
        """PaddleOCR PP-OCRv4-style detector defaults."""
        base = dict(backbone="mobilenetv3", inner_channels=96,
                    resize_mode="limit", norm_style="imagenet",
                    thresh=0.3, box_thresh=0.6, unclip_ratio=1.5)
        base.update(kw)
        return cls(**base)
