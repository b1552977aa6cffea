from .config import RecConfig
from .charset import Charset, default_en_charset
from .model import CTCRecModel
from .processor import RecPreProcessor, RecPostProcessor

__all__ = ["RecConfig", "Charset", "default_en_charset", "CTCRecModel",
           "RecPreProcessor", "RecPostProcessor"]
