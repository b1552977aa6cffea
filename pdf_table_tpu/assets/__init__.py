"""In-tree data assets: model alphabets and language dict files.

The reference resolves these from downloaded checkpoint snapshots
(ocr_table_model_config.py:165-199 keys the hub repo by lang; the snapshot
ships the dict/alphabet txt next to the weights). Converted checkpoints
need byte-identical token ordering, so the small public vocab files are
vendored here:

- alphabets/pubtabnet_structure_alphabet.txt — TableMaster/MtlTabNet
  structure token alphabet (reference
  model/table/mtl_tabnet/data/alphabet/pubtabnet/structure_alphabet.txt;
  published with TableMASTER-mmocr, Apache-2.0).
- alphabets/pubtabnet_textline_alphabet.txt — MtlTabNet cell-content
  recognition alphabet (same provenance).
- dicts/*.txt — PaddleOCR recognition dicts (ppocr_keys_v1 etc.,
  Apache-2.0), generated/vendored for lang-keyed charset resolution.
"""

from __future__ import annotations

import os

_ROOT = os.path.dirname(os.path.abspath(__file__))


def asset_path(*parts: str) -> str:
    """Absolute path of a vendored asset, e.g.
    asset_path('alphabets', 'pubtabnet_structure_alphabet.txt')."""
    p = os.path.join(_ROOT, *parts)
    if not os.path.exists(p):
        raise FileNotFoundError(f"asset not found: {p}")
    return p


def read_lines(*parts: str) -> list:
    """Read an asset txt as a list of lines with EOL stripped. Blank lines
    are preserved only when interior (PaddleOCR dict convention: every
    line, including a bare-space line, is a token)."""
    with open(asset_path(*parts), encoding="utf-8") as f:
        return [ln.rstrip("\r\n") for ln in f]
