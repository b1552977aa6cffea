"""PP-LCNet classifier in flax.

Reference: PPLCNet (model/cls/cls_pp_lcnet.py:164, NET_CONFIG :53-63):
stem s2 16 -> blocks2..6 depthwise-separable stages -> global avg pool ->
optional 1x1 expand conv (class_expand=1280, hardswish) -> fc.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import ConvBNAct, DepthwiseSeparable, hardswish, make_divisible
from .config import ClsPulcConfig

# (kernel, out_c, stride, use_se) per block, grouped by stage
NET_CONFIG = [
    [(3, 32, 1, False)],
    [(3, 64, 2, False), (3, 64, 1, False)],
    [(3, 128, 2, False), (3, 128, 1, False)],
    [(3, 256, 2, False), (5, 256, 1, False), (5, 256, 1, False),
     (5, 256, 1, False), (5, 256, 1, False), (5, 256, 1, False)],
    [(5, 512, 2, True), (5, 512, 1, True)],
]


class PPLCNetClassifier(nn.Module):
    config: ClsPulcConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        d = jnp.dtype(cfg.dtype)
        s = cfg.scale
        x = ConvBNAct(make_divisible(16 * s), (3, 3), (2, 2), act="hardswish",
                      dtype=d, name="stem")(x, train)
        for bi, stage in enumerate(NET_CONFIG):
            for li, (k, c, st, se) in enumerate(stage):
                x = DepthwiseSeparable(
                    make_divisible(c * s), (k, k), (st, st), use_se=se,
                    act="hardswish", dtype=d,
                    name=f"blocks{bi + 2}_{li}")(x, train)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)       # global avg pool
        if cfg.use_last_conv:
            x = nn.Conv(cfg.class_expand, (1, 1), use_bias=False, dtype=d,
                        name="last_conv")(x)
            x = hardswish(x)
        x = x[:, 0, 0, :]
        logits = nn.Dense(cfg.class_num, dtype=d, name="fc")(x)
        logits = logits.astype(jnp.float32)
        if cfg.multilabel:
            return jax.nn.sigmoid(logits)
        return jax.nn.softmax(logits, axis=-1)
