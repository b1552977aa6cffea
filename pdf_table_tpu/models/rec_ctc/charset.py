"""Character sets for CTC decode.

The reference loads vocab files shipped with each checkpoint
(ocr_recognition ChaEncdec:44; ocr_rec_pp BaseRecLabelDecode:17 reads a
dict txt + optional space char). Here the charset is an explicit object:
built-in English printable set, or loaded from a dict file, with the CTC
blank always at id 0 (reference convention: blank=0, processor_ocr_recognition.py:147).
"""

from __future__ import annotations

import os
import string
from typing import List, Sequence


class Charset:
    def __init__(self, chars: Sequence[str], use_space_char: bool = True):
        chars = list(chars)
        if use_space_char and " " not in chars:
            chars.append(" ")
        # id 0 = CTC blank
        self.id_to_char: List[str] = ["<blank>"] + chars
        self.char_to_id = {c: i for i, c in enumerate(self.id_to_char)}

    def __len__(self) -> int:
        return len(self.id_to_char)

    def decode_ids(self, ids: Sequence[int]) -> str:
        out = []
        for i in ids:
            if 0 < i < len(self.id_to_char):
                out.append(self.id_to_char[i])
        return "".join(out)

    def encode(self, text: str) -> List[int]:
        return [self.char_to_id[c] for c in text if c in self.char_to_id]

    @classmethod
    def from_dict_file(cls, path: str, use_space_char: bool = True) -> "Charset":
        with open(path, encoding="utf-8") as f:
            chars = [line.rstrip("\n\r") for line in f if line.rstrip("\n\r")]
        return cls(chars, use_space_char)


def default_en_charset(use_space_char: bool = True) -> Charset:
    """94 printable ASCII (no space; space handled by flag) — matches the
    PP-OCR en_dict ordering convention: digits, letters, punctuation."""
    chars = list(string.digits) + list(string.ascii_letters) + \
        list("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")
    return Charset(chars, use_space_char)


def resolve_charset(name_or_path: str, use_space_char: bool = True) -> Charset:
    if name_or_path == "en" or not name_or_path:
        return default_en_charset(use_space_char)
    if os.path.exists(name_or_path):
        return Charset.from_dict_file(name_or_path, use_space_char)
    raise ValueError(f"unknown charset {name_or_path!r}")
