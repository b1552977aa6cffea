"""TableMaster / MtlTabNet config.

Reference: model/table/mtl_tabnet/ (TableMaster:592, MtlTabNet:460,
table_master_config.py / mtl_tabnet_config.py): TableResNetExtra encoder +
Master transformer decoder emitting structure tokens + bbox; MtlTabNet adds
a cell-content recognition branch (multi-task). In the pipeline, cell text
comes from the OCR matcher for both variants
(match_table_structure_and_text_cell, ocr_table_to_html_task.py:245), so
``variant`` only switches checkpoint layout + head presence.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple


@dataclass
class TableMasterConfig:
    variant: str = "table_master"    # table_master | mtl_tabnet
    img_size: Tuple[int, int] = (480, 480)
    d_model: int = 512
    decoder_layers: int = 3      # N: N-1 shared + forked cls/bbox layers
    heads: int = 8
    ff_dim: int = 2024           # reference d_ff (table_master_config.py:59)
    max_structure_len: int = 500
    vocab_size: int = 0              # 0 -> StructureVocab default
    dict_path: str = ""
    loc_reg_num: int = 4             # xyxy normalized bbox per token
    dtype: str = "float32"
    # MtlTabNet cell-content branch (master_decoder.py MtlTabNetDecoder:194)
    cell_vocab_size: int = 0         # 281 for PubTabNet textline alphabet+4
    max_cell_len: int = 150          # max_seq_len_cell (mtl_tabnet_config:18)
    cell_slots: int = 0              # fixed K td-cell slots for TPU decode
    td_token_ids: Tuple[int, ...] = ()  # ids of '<td></td>'/'<td' (2, 8)
