"""Rasterize a parsed PDF page to an RGB numpy image.

The framework's Ghostscript/Poppler replacement (reference:
model/pdf_table/ghostscript_backend.py:28, poppler_backend.py:12):

- scanned pages: the embedded page image is decoded (cv2) and warped to its
  placement box — this *is* the scan, so fidelity is exact;
- digital pages: vector content (lines/rects) is drawn with cv2 and text is
  drawn with PIL/DejaVu at matching metrics — geometry-faithful, sufficient
  for the detection/TSR model path whose ground truth is the same geometry.
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np

from .reader import PdfDocument, PdfPage

_FONT_CANDIDATES = [
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
]
_font_cache = {}


def _get_font(px_size: int):
    from PIL import ImageFont

    px_size = max(4, min(256, int(round(px_size))))
    if px_size in _font_cache:
        return _font_cache[px_size]
    font = None
    for path in _FONT_CANDIDATES:
        if os.path.exists(path):
            try:
                font = ImageFont.truetype(path, px_size)
                break
            except OSError:
                continue
    if font is None:
        font = ImageFont.load_default()
    _font_cache[px_size] = font
    return font


class _PageFonts:
    """Glyph-faithful font resolution for one page.

    Embedded FontFile/FontFile2/FontFile3 programs (via
    PdfDocument.get_font_program) are loaded directly with
    PIL/FreeType, so digital pages rasterize with the document's OWN
    glyphs; non-embedded (base-14 etc.) fonts fall back to the DejaVu
    substitute. This is the in-tree analog of the reference's
    Ghostscript rasterization (ghostscript_backend.py:28), which got
    glyph fidelity for free from gs's font engine.
    """

    def __init__(self, doc, page_index: int):
        self._doc = doc
        self._page_index = page_index
        self._programs = {}   # base name -> bytes | None
        self._fonts = {}      # (name, px) -> ImageFont

    def get(self, name: str, px_size: float):
        px = max(4, min(256, int(round(px_size))))
        key = (name, px)
        if key in self._fonts:
            return self._fonts[key]
        font = None
        if self._doc is not None and name:
            if name not in self._programs:
                try:
                    data, _fmt = self._doc.get_font_program(
                        self._page_index, name)
                except Exception:
                    data = b""
                self._programs[name] = data or None
            data = self._programs[name]
            if data:
                import io
                from PIL import ImageFont
                try:
                    # FreeType handles TrueType, OpenType/CFF and Type1
                    font = ImageFont.truetype(io.BytesIO(data), px)
                except (OSError, ValueError):
                    self._programs[name] = None   # unloadable: stop retrying
        if font is None:
            font = _get_font(px)
        self._fonts[key] = font
        return font


def render_page(doc: PdfDocument, page: PdfPage, dpi: int = 144,
                background: int = 255) -> np.ndarray:
    """-> uint8 RGB image (H, W, 3). Image y axis points down."""
    from PIL import Image, ImageDraw

    scale = dpi / 72.0
    w_px = max(1, int(round(page.width * scale)))
    h_px = max(1, int(round(page.height * scale)))

    img = np.full((h_px, w_px, 3), background, dtype=np.uint8)

    def to_px(x, y):
        # pdf y-up -> image y-down
        return (x - page.media_box[0]) * scale, h_px - (y - page.media_box[1]) * scale

    # 1. embedded images (bottom layer); needs the doc for stream access
    for im in (page.images if doc is not None else []):
        if im.obj_num < 0:
            continue
        data, kind = doc.get_image_bytes(im.obj_num)
        if not data:
            continue
        decoded = None
        if kind == 1:  # encoded (JPEG etc.)
            arr = np.frombuffer(data, dtype=np.uint8)
            decoded = cv2.imdecode(arr, cv2.IMREAD_COLOR)
            if decoded is not None:
                decoded = cv2.cvtColor(decoded, cv2.COLOR_BGR2RGB)
        else:  # raw samples
            if im.bpc == 8 and im.width > 0 and im.height > 0:
                n = im.width * im.height
                if len(data) >= 3 * n:
                    decoded = np.frombuffer(data[:3 * n], dtype=np.uint8).reshape(
                        im.height, im.width, 3)
                elif len(data) >= n:
                    g = np.frombuffer(data[:n], dtype=np.uint8).reshape(
                        im.height, im.width)
                    decoded = np.stack([g] * 3, axis=-1)
            elif im.bpc == 1 and im.width > 0 and im.height > 0:
                bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
                row_bits = ((im.width + 7) // 8) * 8
                if len(bits) >= row_bits * im.height:
                    g = bits[:row_bits * im.height].reshape(im.height, row_bits)
                    g = (g[:, :im.width] * 255).astype(np.uint8)
                    decoded = np.stack([g] * 3, axis=-1)
        if decoded is None:
            continue
        x0, y1 = to_px(im.bbox[0], im.bbox[1])
        x1, y0 = to_px(im.bbox[2], im.bbox[3])
        xi0, yi0 = max(0, int(round(x0))), max(0, int(round(y0)))
        xi1, yi1 = min(w_px, int(round(x1))), min(h_px, int(round(y1)))
        if xi1 - xi0 < 1 or yi1 - yi0 < 1:
            continue
        resized = cv2.resize(decoded, (xi1 - xi0, yi1 - yi0),
                             interpolation=cv2.INTER_AREA)
        img[yi0:yi1, xi0:xi1] = resized

    # 2. vector content with cv2 (fast)
    for r in page.rects:
        x0, yb = to_px(r.bbox[0], r.bbox[1])
        x1, yt = to_px(r.bbox[2], r.bbox[3])
        p0 = (int(round(x0)), int(round(yt)))
        p1 = (int(round(x1)), int(round(yb)))
        if r.filled and not r.stroked:
            # filled rects: thin ones are rules; large ones shade — draw gray
            area_frac = abs((x1 - x0) * (yb - yt)) / float(w_px * h_px)
            color = (0, 0, 0) if min(abs(x1 - x0), abs(yb - yt)) <= 4 * scale \
                else (200, 200, 200) if area_frac < 0.9 else (255, 255, 255)
            cv2.rectangle(img, p0, p1, color, thickness=-1)
        if r.stroked:
            lw = max(1, int(round(r.lw * scale)))
            cv2.rectangle(img, p0, p1, (0, 0, 0), thickness=lw)
    for s in page.segs:
        x0, y0 = to_px(s.x0, s.y0)
        x1, y1 = to_px(s.x1, s.y1)
        lw = max(1, int(round(s.lw * scale)))
        cv2.line(img, (int(round(x0)), int(round(y0))),
                 (int(round(x1)), int(round(y1))), (0, 0, 0), thickness=lw)
    for c in page.curves:
        if len(c) >= 2:
            pts = np.stack([to_px(x, y) for x, y in c]).round().astype(np.int32)
            cv2.polylines(img, [pts], False, (0, 0, 0), thickness=max(1, int(scale)))

    # 3. text with PIL (TrueType rendering; embedded programs when present)
    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil)
    page_fonts = _PageFonts(doc, page.index)
    for t in page.texts:
        if t.invisible or not t.text.strip():
            continue
        px_size = t.size * scale
        font = page_fonts.get(t.font, px_size)
        # draw anchored at the baseline origin
        x, y = to_px(t.origin[0], t.origin[1])
        if t.is_horizontal:
            try:
                draw.text((x, y), t.text, fill=(0, 0, 0), font=font, anchor="ls")
            except (ValueError, OSError):
                draw.text((x, y - px_size), t.text, fill=(0, 0, 0), font=font)
        else:
            # vertical/rotated text: rasterize horizontally then rotate
            try:
                tw = int(draw.textlength(t.text, font=font)) + 4
            except (ValueError, OSError):
                tw = int(px_size * len(t.text)) + 4
            th = int(px_size * 1.4) + 4
            tile = Image.new("RGB", (max(tw, 1), max(th, 1)), (255, 255, 255))
            ImageDraw.Draw(tile).text((0, 0), t.text, fill=(0, 0, 0), font=font)
            angle = np.degrees(np.arctan2(t.direction[1], t.direction[0]))
            tile = tile.rotate(angle, expand=True, fillcolor=(255, 255, 255))
            pil.paste(tile, (int(x), int(y - tile.height)),
                      mask=tile.convert("L").point(lambda v: 255 - v))
    return np.asarray(pil)


def _ghostscript_binary() -> Optional[str]:
    """Resolve an external rasterizer binary, or None.

    ``PDFTABLE_GS_BINARY`` overrides; otherwise ``gs`` on PATH. The
    reference rasterizes with Ghostscript unconditionally
    (ghostscript_backend.py:28); here it's an opt-in fidelity upgrade
    (``PDFTABLE_RENDER_BACKEND=ghostscript``) over the in-tree
    renderer, which stays the zero-dependency default.
    """
    import shutil

    override = os.environ.get("PDFTABLE_GS_BINARY")
    if override:
        return override if os.path.exists(override) else None
    return shutil.which("gs")


def _render_pdf_ghostscript(path_or_bytes, dpi: int,
                            pages: Optional[list], gs_bin: str):
    """Rasterize via an external Ghostscript subprocess (png16m, like
    the reference's ``-sDEVICE=png16m -r<dpi>``). Raises on failure —
    the caller falls back to the native renderer."""
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory(prefix="pdfio_gs_") as td:
        if isinstance(path_or_bytes, (bytes, bytearray)):
            src = os.path.join(td, "in.pdf")
            with open(src, "wb") as f:
                f.write(path_or_bytes)
        else:
            src = os.fspath(path_or_bytes)
        out_pat = os.path.join(td, "page-%04d.png")
        cmd = [gs_bin, "-q", "-dNOPAUSE", "-dBATCH", "-dSAFER",
               "-sDEVICE=png16m", f"-r{int(dpi)}",
               f"-sOutputFile={out_pat}", src]
        subprocess.run(cmd, check=True, timeout=600,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        rendered = sorted(
            f for f in os.listdir(td) if f.startswith("page-"))
        if not rendered:
            raise RuntimeError("ghostscript produced no pages")
        idxs = pages if pages is not None else range(len(rendered))
        out = []
        for i in idxs:
            if i >= len(rendered):
                continue
            bgr = cv2.imread(os.path.join(td, rendered[i]), cv2.IMREAD_COLOR)
            if bgr is None:
                raise RuntimeError(f"unreadable gs output page {i}")
            out.append((i, cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)))
        return out


def render_pdf(path_or_bytes, dpi: int = 144, pages: Optional[list] = None,
               backend: str = "auto"):
    """Convenience: -> list of (page_index, RGB image).

    ``backend``: ``"native"`` (in-tree renderer), ``"ghostscript"``
    (external binary, error if missing), or ``"auto"`` — native unless
    ``PDFTABLE_RENDER_BACKEND=ghostscript`` is set AND a gs binary is
    available, in which case gs is tried with native as fallback.
    """
    want_gs = backend == "ghostscript" or (
        backend == "auto"
        and os.environ.get("PDFTABLE_RENDER_BACKEND") == "ghostscript")
    if want_gs:
        gs_bin = _ghostscript_binary()
        if gs_bin:
            try:
                return _render_pdf_ghostscript(path_or_bytes, dpi, pages, gs_bin)
            except Exception:
                if backend == "ghostscript":
                    raise
        elif backend == "ghostscript":
            raise RuntimeError("no ghostscript binary found "
                               "(set PDFTABLE_GS_BINARY or install gs)")
    out = []
    with PdfDocument.open(path_or_bytes) as doc:
        idxs = pages if pages is not None else range(doc.page_count)
        for i in idxs:
            page = doc.load_page(i)
            out.append((i, render_page(doc, page, dpi=dpi)))
    return out
