"""RoIAlign as batched bilinear grid-sampling (XLA gathers + VPU blends).

TPU replacement for mmcv's roi_align CUDA op used by the reference's LGPMA
RoI heads (model/table/lgpma/lgpma_roi_head.py). Boxes are (N, 4) xyxy in
feature coords; output is (N, out_h, out_w, C) with the standard 4-sample
average approximated by center-point bilinear sampling per output bin
(sampling_ratio=1), which matches mmcv within interpolation tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_size",))
def roi_align(feat: jax.Array, boxes: jax.Array, out_size: int = 7):
    """feat (H, W, C); boxes (N, 4) xyxy float -> (N, S, S, C)."""
    H, W, C = feat.shape
    N = boxes.shape[0]
    S = out_size
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    # bin centers
    gx = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    sx = x1[:, None] + gx[None, :] * bw[:, None]          # (N, S)
    sy = y1[:, None] + gx[None, :] * bh[:, None]          # (N, S)
    yy = sy[:, :, None]                                   # (N, S, 1)
    xx = sx[:, None, :]                                   # (N, 1, S)
    yy = jnp.broadcast_to(yy, (N, S, S))
    xx = jnp.broadcast_to(xx, (N, S, S))

    y0 = jnp.floor(yy - 0.5)
    x0 = jnp.floor(xx - 0.5)
    wy = (yy - 0.5) - y0
    wx = (xx - 0.5) - x0

    flat = feat.reshape(H * W, C)

    def gather(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        idx = (yi * W + xi).reshape(-1)
        return flat[idx].reshape(N, S, S, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return (v00 * ((1 - wy) * (1 - wx))[..., None]
            + v01 * ((1 - wy) * wx)[..., None]
            + v10 * (wy * (1 - wx))[..., None]
            + v11 * (wy * wx)[..., None])
