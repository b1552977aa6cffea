"""tools/fetch_dicts.py: offline behavior (urlopen mocked).

The dict files define CTC label ids by LINE ORDER, so the fetcher must
reject truncated/invalid downloads and must cover every lang key in
LANG_DICT_FILES (VERDICT r4 #4b: the language-dict gap closes via the
canonical bytes, never a reconstruction)."""

import io
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import fetch_dicts  # noqa: E402

from pdf_table_tpu.models.rec_ctc.charset import LANG_DICT_FILES  # noqa: E402


class _Resp(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _fake_urlopen_factory(n_lines):
    def fake(url, timeout=0):
        chars = [chr(0x4E00 + i) for i in range(n_lines)]
        return _Resp(("\n".join(chars) + "\n").encode("utf-8"))
    return fake


class TestFetchDicts:
    def test_covers_every_lang_key(self):
        for fname in LANG_DICT_FILES.values():
            assert fname in fetch_dicts.DICT_URLS, fname
        # the two structure-token dicts + english ride along
        assert "table_structure_dict.txt" in fetch_dicts.DICT_URLS
        assert "en_dict.txt" in fetch_dicts.DICT_URLS

    def test_fetch_writes_and_parses(self, tmp_path, monkeypatch):
        monkeypatch.setattr(fetch_dicts.urllib.request, "urlopen",
                            _fake_urlopen_factory(9000))
        got = fetch_dicts.fetch_dicts(str(tmp_path),
                                      names={"korean_dict.txt"})
        assert got == {"korean_dict.txt": "9002 ids"}   # +blank +space
        assert (tmp_path / "korean_dict.txt").exists()
        # second call is a cache hit, no network touched
        monkeypatch.setattr(fetch_dicts.urllib.request, "urlopen",
                            lambda *a, **k: pytest.fail("network hit"))
        got2 = fetch_dicts.fetch_dicts(str(tmp_path),
                                       names={"korean_dict.txt"})
        assert got2 == {"korean_dict.txt": "cached"}

    def test_truncated_download_rejected(self, tmp_path, monkeypatch):
        monkeypatch.setattr(fetch_dicts.urllib.request, "urlopen",
                            _fake_urlopen_factory(10))
        with pytest.raises(ValueError, match="truncated"):
            fetch_dicts.fetch_dicts(str(tmp_path),
                                    names={"ppocr_keys_v1.txt"})
        assert not (tmp_path / "ppocr_keys_v1.txt").exists()

    def test_charset_roundtrip_from_fetched_dict(self, tmp_path,
                                                 monkeypatch):
        """Every lang key resolves through the fetched dict and
        round-trips encode/decode (strict mode, no provisional
        fallback)."""
        from pdf_table_tpu.models.rec_ctc.charset import resolve_charset

        monkeypatch.setattr(fetch_dicts.urllib.request, "urlopen",
                            _fake_urlopen_factory(9000))
        fetch_dicts.fetch_dicts(str(tmp_path))
        monkeypatch.setenv("PDFTABLE_DICT_DIR", str(tmp_path))
        for lang in LANG_DICT_FILES:
            cs = resolve_charset(lang, strict=True)
            assert not getattr(cs, "generic_fallback", False)
            text = "丅上"
            assert cs.decode_ids(cs.encode(text)) == text
