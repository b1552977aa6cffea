"""Fetch the authoritative PaddleOCR language dict files.

The reference resolves ch/japan/korean/latin/... recognition through
dict files shipped inside hub checkpoint snapshots
(ocr_table_model_config.py:165-199 routes lang -> repo id; the snapshot
carries e.g. ppocr_keys_v1.txt, which rec_postprocess.BaseRecLabelDecode
reads). This repo's converter copies that sidecar next to converted
weights automatically (convert/hub.py), but a deployment may want the
dicts WITHOUT converting any checkpoint — e.g. to decode with
externally converted weights, or to pre-seed the shared dicts dir.

These files cannot be vendored in-tree: the reference tree contains no
copy (only hub snapshots ship them) and character ORDER defines the CTC
label ids, so any reconstruction that is not byte-exact silently
corrupts decode. This tool downloads the canonical files from the
PaddleOCR repository into ``$PDFTABLE_DICT_DIR`` (default: the shared
cache dicts dir that models/rec_ctc/charset.py::dict_search_dirs
already searches) and sanity-checks each one.

Usage:
    python tools/fetch_dicts.py [--dest DIR] [--langs ch,japan,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_table_tpu.models.rec_ctc.charset import (Charset,  # noqa: E402
                                                  LANG_DICT_FILES)

_BASE = ("https://raw.githubusercontent.com/PaddlePaddle/PaddleOCR/"
         "release/2.7/ppocr/utils")

# lang/table dict -> path under ppocr/utils (ppocr_keys_v1 sits at the
# utils root; everything else under dict/)
DICT_URLS = {
    **{fname: (f"{_BASE}/{fname}" if fname == "ppocr_keys_v1.txt"
               else f"{_BASE}/dict/{fname}")
       for fname in LANG_DICT_FILES.values()},
    # PP-OCR english dict + PP-Structure SLANet structure tokens
    "en_dict.txt": f"{_BASE}/dict/en_dict.txt",
    "table_structure_dict.txt": f"{_BASE}/dict/table_structure_dict.txt",
    "table_structure_dict_ch.txt": f"{_BASE}/dict/table_structure_dict_ch.txt",
}

# loose plausibility floors: a truncated/HTML-error download must fail
_MIN_LINES = {"ppocr_keys_v1.txt": 6000, "korean_dict.txt": 3000,
              "japan_dict.txt": 4000, "chinese_cht_dict.txt": 8000}


def fetch_dicts(dest: str, names=None, timeout: float = 30.0) -> dict:
    os.makedirs(dest, exist_ok=True)
    got = {}
    for fname, url in sorted(DICT_URLS.items()):
        if names and fname not in names:
            continue
        out = os.path.join(dest, fname)
        if os.path.exists(out):
            got[fname] = "cached"
            continue
        with urllib.request.urlopen(url, timeout=timeout) as r:
            data = r.read()
        text = data.decode("utf-8")          # must BE utf-8
        n = sum(1 for ln in text.split("\n") if ln)
        if n < _MIN_LINES.get(fname, 30):
            raise ValueError(f"{fname}: only {n} entries — refusing a "
                             f"truncated/invalid download from {url}")
        with open(out, "wb") as f:
            f.write(data)
        cs = Charset.from_dict_file(out)     # parses as a charset
        got[fname] = f"{len(cs)} ids"
    return got


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dest", default="")
    ap.add_argument("--langs", default="",
                    help="comma-separated lang keys (default: everything)")
    args = ap.parse_args()
    dest = args.dest or os.environ.get("PDFTABLE_DICT_DIR", "")
    if not dest:
        from pdf_table_tpu.utils.constants import Constants
        dest = os.path.join(Constants.MODEL_CACHE_DIR, "dicts")
    names = None
    if args.langs:
        names = {LANG_DICT_FILES[k] for k in args.langs.split(",")}
    try:
        got = fetch_dicts(dest, names)
    except Exception as e:
        print(f"fetch failed: {type(e).__name__}: {e}", file=sys.stderr)
        return 1
    for fname, status in sorted(got.items()):
        print(f"  {fname}: {status}")
    print(f"dicts in {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
