from .config import DbNetConfig
from .model import DBNet
from .processor import DbNetPreProcessor, DbNetPostProcessor

__all__ = ["DbNetConfig", "DBNet", "DbNetPreProcessor", "DbNetPostProcessor"]
