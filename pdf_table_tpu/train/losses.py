"""Loss primitives.

* db_loss — balanced BCE on the prob map + L1 on the threshold map + dice on
  the approximate binary map (reference L1BalanceCELoss,
  model/db_net/seg_detector_loss.py:81-213).
* focal_loss / reg_l1_loss — CenterNet-style primitives used by the LORE
  loss (reference loss/common_loss.py:64-265), shared by later TSR training.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def balanced_bce(pred: jax.Array, gt: jax.Array, mask: jax.Array,
                 negative_ratio: float = 3.0, eps: float = 1e-6) -> jax.Array:
    """OHEM-balanced BCE: all positives + top-k negatives with
    k = negative_ratio * n_pos (seg_detector_loss BalanceCrossEntropyLoss).
    Static-shape version: soft top-k via threshold on sorted losses."""
    pred = jnp.clip(pred, eps, 1.0 - eps)
    bce = -(gt * jnp.log(pred) + (1 - gt) * jnp.log(1 - pred))
    pos = (gt > 0.5) & (mask > 0.5)
    neg = (gt <= 0.5) & (mask > 0.5)
    n_pos = jnp.sum(pos)
    n_neg = jnp.minimum(jnp.sum(neg),
                        (negative_ratio * n_pos).astype(jnp.int32))
    pos_loss = jnp.sum(jnp.where(pos, bce, 0.0))
    # hardest-negative selection with static shapes: sort all negative
    # losses descending, take the first n_neg via an index mask
    neg_losses = jnp.where(neg, bce, -jnp.inf).reshape(-1)
    sorted_neg = jnp.sort(neg_losses)[::-1]
    ranks = jnp.arange(sorted_neg.shape[0])
    neg_loss = jnp.sum(jnp.where(ranks < n_neg,
                                 jnp.where(jnp.isfinite(sorted_neg),
                                           sorted_neg, 0.0), 0.0))
    denom = jnp.maximum(n_pos + n_neg, 1).astype(pred.dtype)
    return (pos_loss + neg_loss) / denom


def dice_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array,
              eps: float = 1e-6) -> jax.Array:
    inter = jnp.sum(pred * gt * mask)
    union = jnp.sum(pred * mask) + jnp.sum(gt * mask) + eps
    return 1.0 - 2.0 * inter / union


def masked_l1(pred: jax.Array, gt: jax.Array, mask: jax.Array,
              eps: float = 1e-6) -> jax.Array:
    return jnp.sum(jnp.abs(pred - gt) * mask) / (jnp.sum(mask) + eps)


def db_loss(outputs: Dict[str, jax.Array], batch: Dict[str, jax.Array],
            l1_scale: float = 10.0, bce_scale: float = 5.0) -> Dict[str, jax.Array]:
    """outputs: {'prob','thresh','binary'}; batch: {'gt','gt_mask',
    'thresh_map','thresh_mask'} (all (B,H,W))."""
    bce = balanced_bce(outputs["prob"], batch["gt"], batch["gt_mask"])
    l1 = masked_l1(outputs["thresh"], batch["thresh_map"], batch["thresh_mask"])
    dice = dice_loss(outputs["binary"], batch["gt"], batch["gt_mask"])
    total = dice + l1_scale * l1 + bce_scale * bce
    return {"loss": total, "bce": bce, "l1": l1, "dice": dice}


def ctc_loss(logits: jax.Array, labels: jax.Array,
             label_paddings: jax.Array, blank_id: int = 0) -> jax.Array:
    """Mean CTC loss over the batch (recognizer training; the reference
    trains its ModelScope recognizers with torch CTCLoss —
    ocr_recognition/modeling_ocr_recognition.py)."""
    import optax

    logit_paddings = jnp.zeros(logits.shape[:2], logits.dtype)
    per = optax.ctc_loss(logits, logit_paddings, labels, label_paddings,
                         blank_id=blank_id)
    return per.mean()


def focal_loss(pred: jax.Array, gt: jax.Array, alpha: float = 2.0,
               beta: float = 4.0, eps: float = 1e-6) -> jax.Array:
    """CenterNet focal loss on gaussian heatmaps
    (reference loss/common_loss.py FocalLoss)."""
    pred = jnp.clip(pred, eps, 1.0 - eps)
    pos = gt >= 1.0 - 1e-6
    neg_weights = jnp.power(1.0 - gt, beta)
    pos_loss = jnp.log(pred) * jnp.power(1 - pred, alpha)
    neg_loss = jnp.log(1 - pred) * jnp.power(pred, alpha) * neg_weights
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return -(jnp.sum(jnp.where(pos, pos_loss, 0.0))
             + jnp.sum(jnp.where(~pos, neg_loss, 0.0))) / n_pos


def reg_l1_loss(pred: jax.Array, gt: jax.Array, ind_mask: jax.Array,
                eps: float = 1e-4) -> jax.Array:
    """L1 over gathered regression targets with validity mask
    (reference RegL1Loss)."""
    m = ind_mask[..., None] if ind_mask.ndim == pred.ndim - 1 else ind_mask
    return jnp.sum(jnp.abs(pred - gt) * m) / (jnp.sum(m) + eps)
