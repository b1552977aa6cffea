from .config import CenterNetConfig
from .model import CycleCenterNet
from .processor import CenterNetPreProcessor, CenterNetPostProcessor

__all__ = ["CenterNetConfig", "CycleCenterNet", "CenterNetPreProcessor",
           "CenterNetPostProcessor"]
