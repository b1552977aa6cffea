from .config import PicoDetConfig
from .model import PicoDet
from .processor import PicoDetPreProcessor, PicoDetPostProcessor

__all__ = ["PicoDetConfig", "PicoDet", "PicoDetPreProcessor",
           "PicoDetPostProcessor"]
