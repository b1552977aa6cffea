"""Evaluation: WTW TSR metrics + TEDS (reference src/pdftable/eval/,
utils/eval/, model/ocr_pdf/table/table_metric/)."""

from .table_metric import TableWtwMetric, pair_match
from .teds import TEDS

__all__ = ["TableWtwMetric", "pair_match", "TEDS"]
