from .config import TableMasterConfig
from .model import TableMaster
from .processor import TableMasterPreProcessor, TableMasterPostProcessor

__all__ = ["TableMasterConfig", "TableMaster", "TableMasterPreProcessor",
           "TableMasterPostProcessor"]
