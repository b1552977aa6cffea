from .config import SLANetConfig
from .model import SLANet
from .processor import SLANetPreProcessor, SLANetPostProcessor
from .vocab import STRUCTURE_TOKENS, StructureVocab

__all__ = ["SLANetConfig", "SLANet", "SLANetPreProcessor",
           "SLANetPostProcessor", "STRUCTURE_TOKENS", "StructureVocab"]
