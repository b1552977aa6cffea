"""Fused image preprocessing ops (device-side).

TPU-native replacement for the reference's per-image cv2 resize/normalize
preprocessing (e.g. db_net/processor_ocr_dbnet.py:50-62,
db_pp/image_operators.py DetResizeForTest:212, ocr_rec_pp resize_norm_img).
Design: one jitted program per (bucket) output shape; variable source sizes
are handled by padding sources into a fixed buffer and sampling with
per-image scale factors, so XLA sees only static shapes.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_weights(out_size: int, in_size, align_corners: bool = False):
    """Sample coordinates for resizing to ``out_size`` from runtime ``in_size``
    (a traced scalar). Uses the half-pixel convention (cv2 default)."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    scale = in_size.astype(jnp.float32) / out_size
    src = (i + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, in_size.astype(jnp.float32) - 1.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(jnp.float32)
    w0 = 1.0 - w1
    return i0, i1, w0, w1


def resize_bilinear(img: jax.Array, out_hw: Tuple[int, int],
                    src_hw=None) -> jax.Array:
    """Bilinear-resize an (H, W, C) image to static ``out_hw``.

    ``src_hw`` (h, w) optionally limits the valid region of ``img`` (the rest
    is padding); defaults to the full array shape.
    """
    H, W = img.shape[0], img.shape[1]
    sh = jnp.asarray(src_hw[0] if src_hw is not None else H, jnp.int32)
    sw = jnp.asarray(src_hw[1] if src_hw is not None else W, jnp.int32)
    oh, ow = out_hw
    y0, y1, wy0, wy1 = _bilinear_weights(oh, sh)
    x0, x1, wx0, wx1 = _bilinear_weights(ow, sw)
    f = img.astype(jnp.float32)
    # gather rows then cols: (oh, W, C) -> (oh, ow, C)
    r0 = jnp.take(f, y0, axis=0)
    r1 = jnp.take(f, y1, axis=0)
    rows = r0 * wy0[:, None, None] + r1 * wy1[:, None, None]
    c0 = jnp.take(rows, x0, axis=1)
    c1 = jnp.take(rows, x1, axis=1)
    return c0 * wx0[None, :, None] + c1 * wx1[None, :, None]


def normalize_image(img: jax.Array, mean: Sequence[float], std: Sequence[float],
                    scale: float = 1.0 / 255.0,
                    dtype=jnp.float32) -> jax.Array:
    """(img * scale - mean) / std, channels-last."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((img.astype(jnp.float32) * scale - mean) / std).astype(dtype)


@functools.partial(jax.jit, static_argnames=("out_hw", "keep_ratio", "dtype"))
def resize_pad_normalize(img: jax.Array, src_hw, out_hw: Tuple[int, int],
                         mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                         keep_ratio: bool = True, dtype=jnp.float32):
    """Fused resize (+aspect-keeping pad) + normalize for one image.

    Returns (out, valid_hw): ``out`` is (out_h, out_w, C); ``valid_hw`` the
    un-padded content size after resize.
    """
    oh, ow = out_hw
    sh = jnp.asarray(src_hw[0], jnp.float32)
    sw = jnp.asarray(src_hw[1], jnp.float32)
    if keep_ratio:
        r = jnp.minimum(oh / sh, ow / sw)
        vh = jnp.round(sh * r).astype(jnp.int32)
        vw = jnp.round(sw * r).astype(jnp.int32)
    else:
        vh = jnp.asarray(oh, jnp.int32)
        vw = jnp.asarray(ow, jnp.int32)
    # Sample a full (oh, ow) grid from the source scaled to (vh, vw); pixels
    # beyond (vh, vw) are masked to 0 after normalization.
    i = jnp.arange(oh, dtype=jnp.float32)
    j = jnp.arange(ow, dtype=jnp.float32)
    sy = (i + 0.5) * (sh / vh.astype(jnp.float32)) - 0.5
    sx = (j + 0.5) * (sw / vw.astype(jnp.float32)) - 0.5
    sy = jnp.clip(sy, 0.0, sh - 1.0)
    sx = jnp.clip(sx, 0.0, sw - 1.0)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, src_hw[0] - 1)
    x1 = jnp.minimum(x0 + 1, src_hw[1] - 1)
    wy = (sy - y0)[:, None, None]
    wx = (sx - x0)[None, :, None]
    f = img.astype(jnp.float32)
    r0 = jnp.take(f, y0, axis=0)
    r1 = jnp.take(f, y1, axis=0)
    top = jnp.take(r0, x0, axis=1) * (1 - wx) + jnp.take(r0, x1, axis=1) * wx
    bot = jnp.take(r1, x0, axis=1) * (1 - wx) + jnp.take(r1, x1, axis=1) * wx
    out = top * (1 - wy) + bot * wy
    out = normalize_image(out, mean, std, dtype=jnp.float32)
    mask = ((jnp.arange(oh)[:, None] < vh) & (jnp.arange(ow)[None, :] < vw))
    out = jnp.where(mask[:, :, None], out, 0.0)
    return out.astype(dtype), jnp.stack([vh, vw])


@functools.partial(jax.jit, static_argnames=("out_hw", "keep_ratio", "dtype"))
def batch_resize_pad_normalize(imgs: jax.Array, src_hws: jax.Array,
                               out_hw: Tuple[int, int],
                               mean=(0.485, 0.456, 0.406),
                               std=(0.229, 0.224, 0.225),
                               keep_ratio: bool = True, dtype=jnp.float32):
    """vmapped fused preprocess over a padded batch.

    imgs: (B, Hmax, Wmax, C) uint8 (padded); src_hws: (B, 2) int32.
    Returns (B, out_h, out_w, C) plus (B, 2) valid sizes.
    """
    fn = lambda im, hw: resize_pad_normalize(im, hw, out_hw, mean, std,
                                             keep_ratio, dtype)
    return jax.vmap(fn)(imgs, src_hws)


def pack_images(images, max_hw=None, pad_multiple: int = 32):
    """Host-side: pack variable-size uint8 HWC numpy images into one padded
    batch buffer + size array (static-shape device input)."""
    n = len(images)
    hs = [im.shape[0] for im in images]
    ws = [im.shape[1] for im in images]
    if max_hw is None:
        mh, mw = max(hs), max(ws)
    else:
        mh, mw = max_hw
    mh = ((mh + pad_multiple - 1) // pad_multiple) * pad_multiple
    mw = ((mw + pad_multiple - 1) // pad_multiple) * pad_multiple
    c = images[0].shape[2] if images[0].ndim == 3 else 1
    buf = np.zeros((n, mh, mw, c), dtype=np.uint8)
    hw = np.zeros((n, 2), dtype=np.int32)
    for k, im in enumerate(images):
        if im.ndim == 2:
            im = im[:, :, None]
        h = min(im.shape[0], mh)
        w = min(im.shape[1], mw)
        buf[k, :h, :w] = im[:h, :w]
        hw[k] = (h, w)
    return buf, hw
