"""Text-recognition (CTC family) config.

One config covers the reference's CTC recognizers: CRNN
(model/crnn/modeling_crnn.py:36), PP-OCR SVTR-LCNet (ONNX 3x48x320,
model/ocr_rec_pp/), and the ConvNextViT chunked recognizer
(model/convnext_vit/). Backbone choice selects the flax architecture.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple


@dataclass
class RecConfig:
    backbone: str = "svtr_lcnet"   # crnn | svtr_lcnet | convnext_vit
    # input geometry: PP rec = (3, 48, 320) processor_ocr_rec_pp resize_norm_img:44;
    # CRNN/ModelScope = gray (1, 32, 804) convnext_vit processor:21.
    img_channels: int = 3
    img_height: int = 48
    img_width: int = 320
    # width buckets for aspect-ratio batching (static shapes for XLA;
    # generalizes the reference's rec_batch_num sort, processor:69-137)
    width_buckets: Tuple[int, ...] = (80, 160, 240, 320, 480, 640)
    max_text_len: int = 80
    # head
    hidden_size: int = 64          # CRNN BiLSTM hidden (modeling_crnn.py:36)
    vocab_size: int = 97           # 95 printable + blank + space handling
    charset_name: str = "en"       # en | dict file path
    use_space_char: bool = True
    blank_id: int = 0
    # SVTR-LCNet (PP-OCRv3 rec): MobileNetV1Enhance scale + EncoderWithSVTR
    # dims/depth/hidden/heads (PaddleOCR rec config; the reference runs the
    # exported ONNX, model/ocr_rec_pp/)
    svtr_scale: float = 0.5
    svtr_dims: int = 64
    svtr_depth: int = 2
    svtr_hidden: int = 120
    svtr_heads: int = 8
    # ConvNextViT chunking (processor_convnext_vit.py:88-96)
    chunk_width: int = 300
    chunk_overlap: int = 48
    # ConvNextViT architecture (modeling_convnext_vit.py:22-33 defaults)
    convnext_depths: Tuple[int, ...] = (3, 3, 8, 3)
    convnext_hidden: Tuple[int, ...] = (96, 192, 256, 512)
    vit_dim: int = 192
    vit_layers: int = 12
    vit_heads: int = 3
    vit_pos_len: int = 75
    dtype: str = "float32"

    @classmethod
    def crnn(cls, **kw) -> "RecConfig":
        base = dict(backbone="crnn", img_channels=1, img_height=32,
                    img_width=320, hidden_size=256)
        base.update(kw)
        return cls(**base)

    @classmethod
    def convnext_vit(cls, **kw) -> "RecConfig":
        # the device program only ever sees chunk-width images (the
        # processor splits 804 -> 3x300), so the single width bucket is the
        # chunk width; the ViT position table is 75 = 300/4 (ckpt layout)
        base = dict(backbone="convnext_vit", img_channels=1, img_height=32,
                    img_width=804, width_buckets=(300,))
        base.update(kw)
        return cls(**base)
