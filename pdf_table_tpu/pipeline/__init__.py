"""Per-page pipeline orchestration (reference L4, ocr_system_task.py:42)."""

from .output import OcrSystemModelOutput
from .system import OcrSystemConfig, OcrSystemTask

__all__ = ["OcrSystemModelOutput", "OcrSystemConfig", "OcrSystemTask"]
