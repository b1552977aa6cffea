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
    """Host-friendly wrapper: returns kept (boxes, scores, indices) arrays
    (numpy), score-sorted — same contract as the reference hard_nms."""
    import numpy as np

    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    if boxes.shape[0] == 0:
        return (np.zeros((0, 4), np.float32), np.zeros((0,), np.float32),
                np.zeros((0,), np.int64))
    keep = np.asarray(nms_mask(boxes, scores, iou_threshold, score_threshold))
    idx = np.where(keep)[0]
    sb = np.asarray(scores)[idx]
    order = np.argsort(-sb, kind="stable")
    idx = idx[order]
    if top_k > 0:
        idx = idx[:top_k]
    return np.asarray(boxes)[idx], np.asarray(scores)[idx], idx
