"""read_pdf API + page dispatch.

Reference: TableExtractor.read_pdf (model/pdf_table/table_extractor.py:84)
and PDFHandler.parse (pdf_handlers.py:86, parser_class map :120).
"""

from __future__ import annotations

from typing import Union

from .core import TableList
from .lattice import TableExtractorLattice
from .pdf_flavor import TableExtractorPdf
from .stream import TableExtractorStream

PARSER_CLASSES = {
    "lattice": TableExtractorLattice,
    "stream": TableExtractorStream,
    "pdf": TableExtractorPdf,
}


class TableExtractor:
    """Flavor validation + per-page parse (reference PDFHandler)."""

    def __init__(self, flavor: str = "pdf", pages: str = "1", **kwargs):
        if flavor not in PARSER_CLASSES:
            raise ValueError(
                f"unknown flavor {flavor!r}; expected one of "
                f"{sorted(PARSER_CLASSES)}")
        self.flavor = flavor
        self.pages = pages
        self.parser = PARSER_CLASSES[flavor](**kwargs)

    def parse(self, filepath: Union[str, bytes]) -> TableList:
        from ..cli.main import parse_pages
        from ..pdfio.reader import PdfDocument

        tables = TableList()
        with PdfDocument.open(filepath) as doc:
            idxs = parse_pages(self.pages, doc.page_count)
            for i in idxs:
                page = doc.load_page(i)
                for t in self.parser.extract_tables(doc, page):
                    t.order = len(tables) + 1
                    tables.append(t)
        return tables


def read_pdf(filepath: Union[str, bytes], pages: str = "1",
             flavor: str = "pdf", **kwargs) -> TableList:
    """Extract tables from a PDF (reference read_pdf,
    table_extractor.py:84). flavor: lattice | stream | pdf."""
    return TableExtractor(flavor=flavor, pages=pages, **kwargs).parse(filepath)
