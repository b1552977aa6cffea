from .config import LoreConfig
from .model import LoreModel
from .processor import LorePreProcessor, LorePostProcessor

__all__ = ["LoreConfig", "LoreModel", "LorePreProcessor", "LorePostProcessor"]
