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


def pair_loss(wh_map: jax.Array, st_map: jax.Array,
              batch: Dict[str, jax.Array],
              eps: float = 1e-4) -> Dict[str, jax.Array]:
    """Cycle-pairing loss (reference PairLoss, loss/common_loss.py:125).

    Supervises wh (center->corner vectors, gathered at hm_ind) and st
    (corner->center vectors, gathered at mk_ind), weighting each element by
    w = 1 - exp(-pi * min(delta^2, 1)) where delta is the relative
    consistency error — hard pairs get emphasized, near-perfect pairs
    barely contribute.

    batch needs: hm_ind (B,M), hm_mask (B,M), wh (B,M,8);
    mk_ind (B,4M), mk_mask (B,4M), st (B,4M,8), ctr_cro_ind (B,4M)
    mapping each cell-corner to its corner slot.
    """
    pred1 = gather_map_at(wh_map, batch["hm_ind"])        # (B, M, 8)
    pred2 = gather_map_at(st_map, batch["mk_ind"])        # (B, 4M, 8)
    target1 = batch["wh"]
    target2 = batch["st"]
    B, M = batch["hm_ind"].shape
    mask = jnp.broadcast_to(batch["hm_mask"][:, :, None],
                            pred1.shape).astype(pred1.dtype)

    # per cell: gather the (dy,dx) each of its 4 corners predicts for it
    p2 = pred2.reshape(B, 4 * pred2.shape[1], 2)
    t2 = target2.reshape(B, 4 * target2.shape[1], 2)
    idx = batch["ctr_cro_ind"][:, :, None].astype(jnp.int32)  # (B, 4M, 1)
    p2g = jnp.take_along_axis(p2, idx, axis=1).reshape(B, M, 8)
    t2g = jnp.take_along_axis(t2, idx, axis=1).reshape(B, M, 8)

    delta = (jnp.abs(pred1 - target1) + jnp.abs(p2g - t2g)) \
        / (jnp.abs(target1) + eps)
    delta = jnp.minimum(delta * delta, 1.0)
    weight = 1.0 - jnp.exp(-3.14 * delta)

    denom = jnp.sum(mask) + eps
    loss1 = jnp.sum(jnp.abs(pred1 - target1) * mask * weight) / denom
    loss2 = jnp.sum(jnp.abs(p2g - t2g) * mask * weight) / denom
    # direct st supervision on valid corner slots (reference loss3 variant)
    m2 = jnp.broadcast_to(batch["mk_mask"][:, :, None],
                          pred2.shape).astype(pred2.dtype)
    loss3 = jnp.sum(jnp.abs(pred2 - target2) * m2) / denom
    return {"wh_l": loss1, "st_l": 0.5 * loss2 + 0.2 * loss3}


def lore_loss(outputs: Dict[str, Any], batch: Dict[str, jax.Array],
              hm_weight: float = 1.0, wh_weight: float = 1.0,
              off_weight: float = 0.1,
              wiz_stacking: bool = True,
              wiz_pairloss: bool = False) -> Dict[str, jax.Array]:
    """outputs: LoreModel.train_forward result; batch targets:
      hm (B, H, W, 2) gaussians; hm_ind (B, M); hm_mask (B, M);
      wh (B, M, 8); reg (B, M, 2); logic (B, M, 4); with wiz_pairloss also
      mk_ind/mk_mask/st/ctr_cro_ind (see pair_loss).
    """
    heads = outputs["heads"]
    hm = outputs["hm"]
    if wiz_pairloss and "mk_ind" in batch:
        # both channels supervised + cycle-pairing (lore_loss.py:36-44)
        hm_l = focal_loss(hm, batch["hm"])
        pl = pair_loss(heads["wh"], heads["st"], batch)
        wh_l, st_l = pl["wh_l"], pl["st_l"]
    else:
        # center channel only (no-pair branch, lore_loss.py:50-54)
        hm_l = focal_loss(hm[..., 0], batch["hm"][..., 0])
        wh_l = reg_l1(heads["wh"], batch["hm_ind"], batch["hm_mask"],
                      batch["wh"])
        st_l = None
    if "corner_reg_ind" in batch:
        # reference packs centers+corners into one reg vector of 5M slots
        # normalized together (lore_coco_utils.py:377-446)
        pc = gather_map_at(heads["reg"], batch["hm_ind"])
        pk = gather_map_at(heads["reg"], batch["corner_reg_ind"])
        mc = batch["hm_mask"][:, :, None]
        mk = batch["corner_reg_mask"][:, :, None]
        num = jnp.sum(jnp.abs(pc - batch["reg"]) * mc) \
            + jnp.sum(jnp.abs(pk - batch["corner_reg"]) * mk)
        off_l = num / (jnp.sum(mc) * 2 + jnp.sum(mk) * 2 + 1e-4)
    else:
        off_l = reg_l1(heads["reg"], batch["hm_ind"], batch["hm_mask"],
                       batch["reg"])
    ax_l = axis_loss(outputs["logi"], batch["hm_mask"], batch["logic"])
    total = hm_weight * hm_l + wh_weight * wh_l + off_weight * off_l \
        + 2.0 * ax_l
    losses = {"hm_l": hm_l, "wh_l": wh_l, "off_l": off_l, "ax_l": ax_l}
    if st_l is not None:
        total = total + st_l
        losses["st_l"] = st_l
    if wiz_stacking:
        sax_l = axis_loss(outputs["stacked_logi"], batch["hm_mask"],
                          batch["logic"])
        total = total + 2.0 * sax_l
        losses["sax_l"] = sax_l
    losses["loss"] = total
    return losses
