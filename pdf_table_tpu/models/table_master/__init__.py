from .config import TableMasterConfig
from .model import TableMaster
from .processor import TableMasterPreProcessor, TableMasterPostProcessor
from .vocab import (MasterStructureVocab, load_pubtabnet_structure_alphabet,
                    load_pubtabnet_textline_alphabet)

__all__ = ["TableMasterConfig", "TableMaster", "TableMasterPreProcessor",
           "TableMasterPostProcessor", "MasterStructureVocab",
           "load_pubtabnet_structure_alphabet",
           "load_pubtabnet_textline_alphabet"]
