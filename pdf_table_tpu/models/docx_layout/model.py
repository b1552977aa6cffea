"""DocXLayout: DLA-34 CenterNet layout detector
(reference modeling_docxlayout.py:58 + model_dla.py:226)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..centernet_base import DLACenterNet
from .config import DocXLayoutConfig


class DocXLayoutModel(nn.Module):
    config: DocXLayoutConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        return DLACenterNet(self.config.heads, self.config.head_conv,
                            dtype=jnp.dtype(self.config.dtype),
                            name="dla")(x, train)
