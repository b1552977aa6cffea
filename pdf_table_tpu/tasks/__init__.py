"""Inference tasks: the runtime layer over the model zoo.

TPU-native redesign of the reference's model/ocr_pdf task classes
(SURVEY.md §1 L3): each task = host preprocess -> jitted device program ->
host postprocess, with static-shape bucketing.
"""

from .detection import OcrDetectionTask
from .recognition import OcrRecognitionTask

__all__ = ["OcrDetectionTask", "OcrRecognitionTask"]
