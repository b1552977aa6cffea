"""Weight conversion: reference torch/paddle checkpoints -> flax orbax.

Reference checkpoints come from HF/ModelScope snapshots
(common_utils.py:465); this package maps their state dicts onto the flax
module trees so users of the reference can carry weights over
(SURVEY.md §7 'weight converters').
"""

from .torch_to_flax import (convert_conv, convert_bn, convert_dense,
                            ConversionReport, TorchTensorSource)

__all__ = ["convert_conv", "convert_bn", "convert_dense",
           "ConversionReport", "TorchTensorSource"]
