"""Generate C++ width tables for the PDF base-14 fonts from matplotlib's
bundled URW AFM metrics (public, metric-compatible with Adobe base 14).

Emits pdf_table_tpu/pdfio/native/fonts_base14.h:
  - per-font 256-entry width arrays for WinAnsiEncoding and StandardEncoding
  - per-font ascent/descent
  - WinAnsi code -> unicode table
  - glyph-name -> unicode table (AGL subset covering the AFM glyph set)

Run once: python tools/gen_base14.py
"""

import os
import re

import matplotlib

AFM_DIR = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data", "fonts", "afm")

# base-14 postscript name -> URW afm file
FONTS = {
    "Helvetica": "phvr8a.afm",
    "Helvetica-Bold": "phvb8a.afm",
    "Helvetica-Oblique": "phvro8a.afm",
    "Helvetica-BoldOblique": "phvbo8a.afm",
    "Times-Roman": "ptmr8a.afm",
    "Times-Bold": "ptmb8a.afm",
    "Times-Italic": "ptmri8a.afm",
    "Times-BoldItalic": "ptmbi8a.afm",
    "Courier": "pcrr8a.afm",
    "Courier-Bold": "pcrb8a.afm",
    "Courier-Oblique": "pcrro8a.afm",
    "Courier-BoldOblique": "pcrbo8a.afm",
    "Symbol": "psyr.afm",
    "ZapfDingbats": "pzdr.afm",
}


def parse_afm(path):
    """-> (name->width dict, code->name dict (StandardEncoding), ascent, descent)"""
    widths, code2name = {}, {}
    ascent, descent = 718, -207
    with open(path, "rb") as f:
        in_chars = False
        for raw in f:
            line = raw.decode("latin-1").strip()
            if line.startswith("Ascender"):
                ascent = int(float(line.split()[1]))
            elif line.startswith("Descender"):
                descent = int(float(line.split()[1]))
            elif line.startswith("StartCharMetrics"):
                in_chars = True
            elif line.startswith("EndCharMetrics"):
                in_chars = False
            elif in_chars and line.startswith("C "):
                m = re.match(r"C\s+(-?\d+)\s*;\s*WX\s+(-?\d+)\s*;\s*N\s+(\S+)\s*;", line)
                if m:
                    code, wx, name = int(m.group(1)), int(m.group(2)), m.group(3)
                    widths[name] = wx
                    if code >= 0:
                        code2name[code] = name
    return widths, code2name, ascent, descent


def glyphname_to_unicode(name):
    """AGL-style resolution for the glyph names in these AFMs."""
    import unicodedata
    AGL = {
        "space": 0x20, "exclam": 0x21, "quotedbl": 0x22, "numbersign": 0x23,
        "dollar": 0x24, "percent": 0x25, "ampersand": 0x26, "quoteright": 0x2019,
        "quotesingle": 0x27, "parenleft": 0x28, "parenright": 0x29, "asterisk": 0x2A,
        "plus": 0x2B, "comma": 0x2C, "hyphen": 0x2D, "period": 0x2E, "slash": 0x2F,
        "zero": 0x30, "one": 0x31, "two": 0x32, "three": 0x33, "four": 0x34,
        "five": 0x35, "six": 0x36, "seven": 0x37, "eight": 0x38, "nine": 0x39,
        "colon": 0x3A, "semicolon": 0x3B, "less": 0x3C, "equal": 0x3D,
        "greater": 0x3E, "question": 0x3F, "at": 0x40, "bracketleft": 0x5B,
        "backslash": 0x5C, "bracketright": 0x5D, "asciicircum": 0x5E,
        "underscore": 0x5F, "quoteleft": 0x2018, "grave": 0x60, "braceleft": 0x7B,
        "bar": 0x7C, "braceright": 0x7D, "asciitilde": 0x7E, "exclamdown": 0xA1,
        "cent": 0xA2, "sterling": 0xA3, "fraction": 0x2044, "yen": 0xA5,
        "florin": 0x192, "section": 0xA7, "currency": 0xA4, "quotedblleft": 0x201C,
        "guillemotleft": 0xAB, "guilsinglleft": 0x2039, "guilsinglright": 0x203A,
        "fi": 0xFB01, "fl": 0xFB02, "endash": 0x2013, "dagger": 0x2020,
        "daggerdbl": 0x2021, "periodcentered": 0xB7, "paragraph": 0xB6,
        "bullet": 0x2022, "quotesinglbase": 0x201A, "quotedblbase": 0x201E,
        "quotedblright": 0x201D, "guillemotright": 0xBB, "ellipsis": 0x2026,
        "perthousand": 0x2030, "questiondown": 0xBF, "acute": 0xB4,
        "circumflex": 0x2C6, "tilde": 0x2DC, "macron": 0xAF, "breve": 0x2D8,
        "dotaccent": 0x2D9, "dieresis": 0xA8, "ring": 0x2DA, "cedilla": 0xB8,
        "hungarumlaut": 0x2DD, "ogonek": 0x2DB, "caron": 0x2C7, "emdash": 0x2014,
        "AE": 0xC6, "ordfeminine": 0xAA, "Lslash": 0x141, "Oslash": 0xD8,
        "OE": 0x152, "ordmasculine": 0xBA, "ae": 0xE6, "dotlessi": 0x131,
        "lslash": 0x142, "oslash": 0xF8, "oe": 0x153, "germandbls": 0xDF,
        "onesuperior": 0xB9, "twosuperior": 0xB2, "threesuperior": 0xB3,
        "onehalf": 0xBD, "onequarter": 0xBC, "threequarters": 0xBE,
        "degree": 0xB0, "brokenbar": 0xA6, "copyright": 0xA9, "logicalnot": 0xAC,
        "registered": 0xAE, "plusminus": 0xB1, "micro": 0xB5, "multiply": 0xD7,
        "divide": 0xF7, "trademark": 0x2122, "Euro": 0x20AC, "minus": 0x2212,
        "mu": 0xB5,
    }
    if name in AGL:
        return AGL[name]
    if len(name) == 1:
        return ord(name)
    if re.fullmatch(r"uni([0-9A-Fa-f]{4})", name):
        return int(name[3:], 16)
    # accented latin: Aacute etc.
    try:
        base = name[0]
        rest = name[1:].lower()
        combos = {"acute": "ACUTE", "grave": "GRAVE", "circumflex": "CIRCUMFLEX",
                  "dieresis": "DIAERESIS", "tilde": "TILDE", "ring": "RING ABOVE",
                  "cedilla": "CEDILLA", "slash": "STROKE", "caron": "CARON",
                  "breve": "BREVE", "macron": "MACRON", "ogonek": "OGONEK",
                  "hungarumlaut": "DOUBLE ACUTE", "dotaccent": "DOT ABOVE"}
        if rest in combos and base.isalpha():
            case = "CAPITAL" if base.isupper() else "SMALL"
            ch = unicodedata.lookup(
                f"LATIN {case} LETTER {base.upper()} WITH {combos[rest]}")
            return ord(ch)
    except KeyError:
        pass
    if name in ("Eth", "eth"):
        return 0xD0 if name[0].isupper() else 0xF0
    if name in ("Thorn", "thorn"):
        return 0xDE if name[0].isupper() else 0xFE
    return 0


def main():
    # WinAnsi (cp1252) code -> unicode
    win_uni = []
    for c in range(256):
        try:
            u = ord(bytes([c]).decode("cp1252"))
        except UnicodeDecodeError:
            u = 0
        win_uni.append(u)

    # unicode -> glyph name (reverse of AGL over all AFM glyph names)
    fonts = {}
    all_names = set()
    for ps, fn in FONTS.items():
        widths, code2name, asc, desc = parse_afm(os.path.join(AFM_DIR, fn))
        fonts[ps] = (widths, code2name, asc, desc)
        all_names.update(widths)

    name_uni = {n: glyphname_to_unicode(n) for n in sorted(all_names)}
    uni_name = {}
    for n, u in name_uni.items():
        if u and u not in uni_name:
            uni_name[u] = n

    lines = []
    lines.append("// GENERATED by tools/gen_base14.py from matplotlib URW AFM metrics.")
    lines.append("// Metric-compatible with the Adobe base-14 PDF fonts. Do not edit.")
    lines.append("#pragma once")
    lines.append("#include <cstdint>")
    lines.append("namespace pdfio {")
    lines.append("struct Base14Font { const char* name; int ascent; int descent; "
                 "const short* win; const short* std; };")

    defs = []
    for ps, (widths, code2name, asc, desc) in fonts.items():
        cname = ps.replace("-", "_")
        win = [0] * 256
        std = [0] * 256
        if ps in ("Symbol", "ZapfDingbats"):
            # symbolic: built-in encoding only; use AFM codes for both tables
            for code, n in code2name.items():
                if 0 <= code < 256:
                    win[code] = std[code] = widths.get(n, 0)
        else:
            for code in range(256):
                u = win_uni[code]
                n = uni_name.get(u)
                if n and n in widths:
                    win[code] = widths[n]
            for code, n in code2name.items():
                if 0 <= code < 256:
                    std[code] = widths.get(n, 0)
        defs.append((ps, cname, asc, desc))
        lines.append(f"static const short kW_{cname}_win[256] = {{"
                     + ",".join(str(w) for w in win) + "};")
        lines.append(f"static const short kW_{cname}_std[256] = {{"
                     + ",".join(str(w) for w in std) + "};")

    lines.append("static const Base14Font kBase14[] = {")
    for ps, cname, asc, desc in defs:
        lines.append(f'  {{"{ps}", {asc}, {desc}, kW_{cname}_win, kW_{cname}_std}},')
    lines.append("};")
    lines.append(f"static const int kBase14Count = {len(defs)};")

    lines.append("static const int kWinAnsiUnicode[256] = {"
                 + ",".join(str(u) for u in win_uni) + "};")

    # glyph name -> unicode, sorted for binary search
    lines.append("struct GlyphUni { const char* name; int uni; };")
    gl = sorted((n, u) for n, u in name_uni.items() if u)
    lines.append("static const GlyphUni kGlyphUni[] = {")
    for n, u in gl:
        lines.append(f'  {{"{n}", {u}}},')
    lines.append("};")
    lines.append(f"static const int kGlyphUniCount = {len(gl)};")
    lines.append("}  // namespace pdfio")

    out = os.path.join(os.path.dirname(__file__), "..",
                       "pdf_table_tpu", "pdfio", "native", "fonts_base14.h")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(defs)} fonts, {len(gl)} glyph names")


if __name__ == "__main__":
    main()
