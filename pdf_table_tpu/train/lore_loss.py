"""LORE training loss.

Reference: TableLoreLoss (loss/lore_loss.py:15) + primitives
(loss/common_loss.py:18-208): CenterNet focal on heatmaps, RegL1 on
gathered wh/reg targets, AxisLoss (L1/(4*n_valid)) on base and stacked
logical predictions. Combination (lore_loss.py:63-71):
loss = hm + wh + 0.1*off + 2*ax (+ 2*sax with stacking).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .losses import focal_loss


def gather_map_at(feat_map: jax.Array, ind: jax.Array) -> jax.Array:
    """feat_map (B, H, W, D), ind (B, M) flat H*W -> (B, M, D)."""
    B, H, W, D = feat_map.shape
    flat = feat_map.reshape(B, H * W, D)
    return jnp.take_along_axis(flat, ind[:, :, None], axis=1)


def reg_l1(feat_map: jax.Array, ind: jax.Array, mask: jax.Array,
           target: jax.Array, eps: float = 1e-4) -> jax.Array:
    """RegL1Loss (common_loss.py:112): L1 over gathered predictions."""
    pred = gather_map_at(feat_map, ind)
    m = jnp.broadcast_to(mask[:, :, None], pred.shape).astype(pred.dtype)
    return jnp.sum(jnp.abs(pred * m - target * m)) / (jnp.sum(m) + eps)


def axis_loss(logi: jax.Array, mask: jax.Array, target: jax.Array,
              eps: float = 1e-4) -> jax.Array:
    """AxisLoss (common_loss.py:64): L1 / (4 * n_valid)."""
    m = mask[:, :, None].astype(logi.dtype)
    return jnp.sum(jnp.abs(logi * m - target * m)) / (4 * (jnp.sum(m) + eps))


def lore_loss(outputs: Dict[str, Any], batch: Dict[str, jax.Array],
              hm_weight: float = 1.0, wh_weight: float = 1.0,
              off_weight: float = 0.1,
              wiz_stacking: bool = True) -> Dict[str, jax.Array]:
    """outputs: LoreModel.train_forward result; batch targets:
      hm (B, H, W, 2) gaussians; hm_ind (B, M); hm_mask (B, M);
      wh (B, M, 8); reg (B, M, 2); logic (B, M, 4).
    """
    heads = outputs["heads"]
    hm = outputs["hm"]
    # supervision on the center channel (no-pair branch, lore_loss.py:50-54)
    hm_l = focal_loss(hm[..., 0], batch["hm"][..., 0])
    wh_l = reg_l1(heads["wh"], batch["hm_ind"], batch["hm_mask"], batch["wh"])
    off_l = reg_l1(heads["reg"], batch["hm_ind"], batch["hm_mask"],
                   batch["reg"])
    ax_l = axis_loss(outputs["logi"], batch["hm_mask"], batch["logic"])
    total = hm_weight * hm_l + wh_weight * wh_l + off_weight * off_l \
        + 2.0 * ax_l
    losses = {"hm_l": hm_l, "wh_l": wh_l, "off_l": off_l, "ax_l": ax_l}
    if wiz_stacking:
        sax_l = axis_loss(outputs["stacked_logi"], batch["hm_mask"],
                          batch["logic"])
        total = total + 2.0 * sax_l
        losses["sax_l"] = sax_l
    losses["loss"] = total
    return losses
