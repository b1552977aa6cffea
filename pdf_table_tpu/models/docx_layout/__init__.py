from .config import DocXLayoutConfig
from .model import DocXLayoutModel
from .processor import DocXLayoutPreProcessor, DocXLayoutPostProcessor

__all__ = ["DocXLayoutConfig", "DocXLayoutModel", "DocXLayoutPreProcessor",
           "DocXLayoutPostProcessor"]
