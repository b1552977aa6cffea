"""Box NMS as static-shape XLA programs.

Replaces the reference's numpy hard_nms (picodet/processor_picodet.py:301)
with an O(N^2) masked formulation that runs on device with a fixed box
budget — no data-dependent shapes, no host sync inside the decode loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _iou_matrix(boxes: jax.Array) -> jax.Array:
    """(N, 4) xyxy -> (N, N) IoU."""
    a = boxes[:, None, :]
    b = boxes[None, :, :]
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@functools.partial(jax.jit, static_argnames=())
def nms_mask(boxes: jax.Array, scores: jax.Array, iou_threshold: float = 0.5,
             score_threshold: float = 0.0) -> jax.Array:
    """Greedy NMS keep-mask over (N, 4)/(N,) without sorting gathers.

    Iterates in score order via a fori_loop over N (static); each step keeps
    the current best unsuppressed box and suppresses its overlaps.
    """
    n = boxes.shape[0]
    iou = _iou_matrix(boxes)
    valid = scores > score_threshold
    keep = jnp.zeros((n,), bool)

    def body2(_, state):
        keep, alive = state
        s = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(s)
        has = s[best] > -jnp.inf
        sel = (jnp.arange(n) == best) & has
        keep = keep | sel
        suppress = (iou[best] >= iou_threshold) & has
        alive = alive & ~suppress & ~sel
        return keep, alive

    keep, _ = jax.lax.fori_loop(0, n, body2, (keep, valid))
    return keep


def hard_nms(boxes, scores, iou_threshold: float = 0.5,
             score_threshold: float = 0.0, top_k: int = -1):
    """Host greedy NMS in pure numpy: returns kept (boxes, scores, indices)
    arrays, score-sorted — same contract as the reference hard_nms.

    Pure numpy on purpose: candidate sets are tiny (~10^2) and dispatching
    the jitted nms_mask here costs a full device round trip per call
    (~40-100 ms over the remote tunnel vs ~50 us of numpy). nms_mask stays
    for NMS embedded inside larger jitted programs."""
    import numpy as np

    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    if boxes.shape[0] == 0:
        return (np.zeros((0, 4), np.float32), np.zeros((0,), np.float32),
                np.zeros((0,), np.int64))
    valid = scores > score_threshold
    order = np.argsort(-scores, kind="stable")
    order = order[valid[order]]
    area = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) \
        * np.clip(boxes[:, 3] - boxes[:, 1], 0, None)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        union = area[i] + area - inter
        # guard before dividing: zero-area pairs must not emit NaN even
        # transiently (np.where still evaluates both branches)
        iou = np.divide(inter, union, out=np.zeros_like(inter),
                        where=union > 0)
        suppressed |= iou >= iou_threshold
    idx = np.asarray(keep, np.int64)
    if top_k > 0:
        idx = idx[:top_k]
    return boxes[idx], scores[idx], idx
