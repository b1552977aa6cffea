"""Classical (model-free) PDF table extraction — camelot lineage.

Reference: src/pdftable/model/pdf_table/ (SURVEY.md §2.6): read_pdf API
with flavors lattice | stream | pdf, Cell/Table/TableList core, OpenCV
line/joint detection, text-edge clustering.
"""

from .core import Cell, Table, TableList
from .extractor import TableExtractor, read_pdf

__all__ = ["Cell", "Table", "TableList", "TableExtractor", "read_pdf"]
