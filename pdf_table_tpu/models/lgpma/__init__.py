from .config import LgpmaConfig
from .model import LGPMA
from .processor import LgpmaPreProcessor, LgpmaPostProcessor

__all__ = ["LgpmaConfig", "LGPMA", "LgpmaPreProcessor", "LgpmaPostProcessor"]
