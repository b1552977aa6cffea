"""pdfio — the framework's native PDF layer.

A C++ PDF reader (tokenizer, xref/objstm resolution, stream filters,
content-stream interpretation) exposed through ctypes, plus a pure-Python
PDF writer and a rasterizer. Fills the role pdfminer / pypdf / Ghostscript
play in the reference (reference: src/pdftable/utils/pdf_utils.py,
model/pdf_table/ghostscript_backend.py) — none of which exist in this image.
"""

from .reader import PdfDocument, PdfPage, PdfText, PdfSeg, PdfRect, PdfImage
from .writer import PdfWriter
from .render import render_page

__all__ = [
    "PdfDocument",
    "PdfPage",
    "PdfText",
    "PdfSeg",
    "PdfRect",
    "PdfImage",
    "PdfWriter",
    "render_page",
]
