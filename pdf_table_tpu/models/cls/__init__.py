from .config import PULC_LABELS, ClsPulcConfig
from .model import PPLCNetClassifier
from .processor import PulcPreProcessor, PulcPostProcessor

__all__ = ["PULC_LABELS", "ClsPulcConfig", "PPLCNetClassifier",
           "PulcPreProcessor", "PulcPostProcessor"]
