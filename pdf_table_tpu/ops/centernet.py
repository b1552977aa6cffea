"""CenterNet-family decode primitives as static-shape XLA ops.

TPU formulation of the reference's decode helpers
(lore/lineless_table_process.py: _nms:66, _topk:76, ctdet_4ps_decode:127,
corner_decode:97; docx_layout/processor_utils.py ctdet_4ps_decode:68;
center_net/table_process.py bbox_decode/gbox_decode): K is static, no
.cpu()/.numpy() syncs inside the decode — everything stays on device until
the final per-page gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("kernel",))
def heatmap_nms(heat: jax.Array, kernel: int = 3) -> jax.Array:
    """Keep local maxima only: heat (B, H, W, C) -> same shape.
    (reference _nms: maxpool equality mask)."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return jnp.where(hmax == heat, heat, 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_scores(heat: jax.Array, k: int):
    """heat (B, H, W, C) -> (scores, inds, clses, ys, xs), each (B, k).
    ``inds`` index the flattened H*W plane (class-agnostic, like reference
    _topk which merges per-class topk)."""
    b, h, w, c = heat.shape
    flat = heat.transpose(0, 3, 1, 2).reshape(b, c * h * w)
    if k > flat.shape[1]:
        # tiny feature maps (small crop-resolution buckets): take all
        # cells, pad with -inf so downstream score thresholds drop them
        scores, inds_all = jax.lax.top_k(flat, flat.shape[1])
        pad = k - flat.shape[1]
        scores = jnp.pad(scores, ((0, 0), (0, pad)),
                         constant_values=-jnp.inf)
        inds_all = jnp.pad(inds_all, ((0, 0), (0, pad)))
    else:
        scores, inds_all = jax.lax.top_k(flat, k)
    clses = inds_all // (h * w)
    inds = inds_all % (h * w)
    ys = (inds // w).astype(jnp.float32)
    xs = (inds % w).astype(jnp.float32)
    return scores, inds, clses, ys, xs


def gather_feat(feat: jax.Array, inds: jax.Array) -> jax.Array:
    """feat (B, H*W, D), inds (B, K) -> (B, K, D) (reference _gather_feat)."""
    return jnp.take_along_axis(feat, inds[:, :, None], axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def decode_boxes_4ps(heat: jax.Array, wh: jax.Array, reg: jax.Array, k: int):
    """LORE/DocXLayout-style 4-point box decode.

    heat (B, H, W, C) post-sigmoid; wh (B, H, W, 8) center->corner offsets;
    reg (B, H, W, 2) sub-pixel center refinement.
    Returns (bboxes (B, K, 8), scores (B, K), clses (B, K), centers (B, K, 2),
    inds (B, K)) in feature-map coordinates.
    """
    b, h, w, _ = heat.shape
    heat = heatmap_nms(heat)
    scores, inds, clses, ys, xs = topk_scores(heat, k)
    reg_f = reg.reshape(b, h * w, 2)
    r = gather_feat(reg_f, inds)
    cx = xs + r[:, :, 0]
    cy = ys + r[:, :, 1]
    wh_f = wh.reshape(b, h * w, 8)
    o = gather_feat(wh_f, inds)
    # corners = center - offset per reference convention (wh stores center-to-
    # corner vectors for 4 points: x1..x4, y1..y4 interleaved pairs)
    xs4 = cx[:, :, None] - o[:, :, 0::2]
    ys4 = cy[:, :, None] - o[:, :, 1::2]
    bboxes = jnp.stack([xs4[..., 0], ys4[..., 0], xs4[..., 1], ys4[..., 1],
                        xs4[..., 2], ys4[..., 2], xs4[..., 3], ys4[..., 3]],
                       axis=-1)
    centers = jnp.stack([cx, cy], axis=-1)
    return bboxes, scores, clses, centers, inds


@functools.partial(jax.jit, static_argnames=("k",))
def decode_centernet_bbox(heat: jax.Array, wh: jax.Array, reg: jax.Array, k: int):
    """Standard axis-aligned CenterNet decode: wh (B, H, W, 2).
    Returns (bboxes (B, K, 4) xyxy, scores, clses, inds)."""
    b, h, w, _ = heat.shape
    heat = heatmap_nms(heat)
    scores, inds, clses, ys, xs = topk_scores(heat, k)
    r = gather_feat(reg.reshape(b, h * w, 2), inds)
    cx = xs + r[:, :, 0]
    cy = ys + r[:, :, 1]
    sz = gather_feat(wh.reshape(b, h * w, 2), inds)
    bboxes = jnp.stack([cx - sz[:, :, 0] / 2, cy - sz[:, :, 1] / 2,
                        cx + sz[:, :, 0] / 2, cy + sz[:, :, 1] / 2], axis=-1)
    return bboxes, scores, clses, inds
