"""Perspective crop of rotated text boxes, batched on device.

Replaces the reference's per-box cv2.getPerspectiveTransform +
cv2.warpPerspective loop (utils/ocr/ocr_common_utils.py:214 crop_image,
ocr_system_task.py:309-314 hot loop): homographies are computed host-side
(tiny closed-form solves), sampling runs as one vmapped gather program on
device for all crops of a page at once.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def order_points_clockwise(pts: np.ndarray) -> np.ndarray:
    """Order 4 points as [top-left, top-right, bottom-right, bottom-left]
    (image coords, y down). Same contract as the reference's
    order_point/order_points_clockwise."""
    pts = np.asarray(pts, dtype=np.float32).reshape(4, 2)
    s = pts.sum(axis=1)
    d = pts[:, 0] - pts[:, 1]
    tl = pts[np.argmin(s)]
    br = pts[np.argmax(s)]
    tr = pts[np.argmax(d)]
    bl = pts[np.argmin(d)]
    return np.stack([tl, tr, br, bl])


def _homography_from_quad(src_quad: np.ndarray, dst_w: float, dst_h: float) -> np.ndarray:
    """3x3 matrix mapping dst rect (0,0)-(w,h) -> src quad (for inverse-map
    sampling). Closed-form projective solve."""
    dst = np.array([[0, 0], [dst_w, 0], [dst_w, dst_h], [0, dst_h]], dtype=np.float64)
    src = np.asarray(src_quad, dtype=np.float64)
    # Solve for H with H @ [xd, yd, 1] ~ [xs, ys, 1]
    A = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        xd, yd = dst[i]
        xs, ys = src[i]
        A[2 * i] = [xd, yd, 1, 0, 0, 0, -xd * xs, -yd * xs]
        b[2 * i] = xs
        A[2 * i + 1] = [0, 0, 0, xd, yd, 1, -xd * ys, -yd * ys]
        b[2 * i + 1] = ys
    try:
        h = np.linalg.solve(A, b)
    except np.linalg.LinAlgError:
        h = np.linalg.lstsq(A, b, rcond=None)[0]
    return np.array([[h[0], h[1], h[2]], [h[3], h[4], h[5]], [h[6], h[7], 1.0]],
                    dtype=np.float32)


def perspective_matrices(quads: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """(N, 4, 2) clockwise quads -> (N, 3, 3) dst->src homographies."""
    oh, ow = out_hw
    return np.stack([_homography_from_quad(q, ow, oh) for q in quads]) \
        if len(quads) else np.zeros((0, 3, 3), np.float32)


def order_points_clockwise_batch(pts: np.ndarray) -> np.ndarray:
    """(N, 4, 2) -> (N, 4, 2) ordered [tl, tr, br, bl] per quad —
    vectorized order_points_clockwise (the per-crop python loop costs
    real milliseconds at page volume)."""
    pts = np.asarray(pts, np.float32).reshape(-1, 4, 2)
    if not len(pts):
        return pts
    s = pts.sum(axis=2)
    d = pts[:, :, 0] - pts[:, :, 1]
    n = np.arange(len(pts))
    return np.stack([pts[n, np.argmin(s, axis=1)],
                     pts[n, np.argmax(d, axis=1)],
                     pts[n, np.argmax(s, axis=1)],
                     pts[n, np.argmin(d, axis=1)]], axis=1)


def homographies_from_quads_batch(src_quads: np.ndarray,
                                  dst_w: np.ndarray,
                                  dst_h: np.ndarray) -> np.ndarray:
    """Batched closed-form projective solve: (N, 4, 2) quads + per-quad
    dst sizes -> (N, 3, 3) dst->src homographies (vectorized
    _homography_from_quad; one batched 8x8 solve instead of N python
    loops)."""
    src = np.asarray(src_quads, np.float64).reshape(-1, 4, 2)
    N = len(src)
    if not N:
        return np.zeros((0, 3, 3), np.float32)
    dst_w = np.broadcast_to(np.asarray(dst_w, np.float64), (N,))
    dst_h = np.broadcast_to(np.asarray(dst_h, np.float64), (N,))
    zeros = np.zeros(N)
    ones = np.ones(N)
    dst = np.stack([
        np.stack([zeros, zeros], 1), np.stack([dst_w, zeros], 1),
        np.stack([dst_w, dst_h], 1), np.stack([zeros, dst_h], 1)],
        axis=1)                                              # (N, 4, 2)
    A = np.zeros((N, 8, 8))
    b = np.zeros((N, 8))
    for i in range(4):
        xd, yd = dst[:, i, 0], dst[:, i, 1]
        xs, ys = src[:, i, 0], src[:, i, 1]
        A[:, 2 * i, 0] = xd
        A[:, 2 * i, 1] = yd
        A[:, 2 * i, 2] = 1.0
        A[:, 2 * i, 6] = -xd * xs
        A[:, 2 * i, 7] = -yd * xs
        b[:, 2 * i] = xs
        A[:, 2 * i + 1, 3] = xd
        A[:, 2 * i + 1, 4] = yd
        A[:, 2 * i + 1, 5] = 1.0
        A[:, 2 * i + 1, 6] = -xd * ys
        A[:, 2 * i + 1, 7] = -yd * ys
        b[:, 2 * i + 1] = ys
    try:
        h = np.linalg.solve(A, b[..., None])[..., 0]
    except np.linalg.LinAlgError:
        h = np.stack([np.linalg.lstsq(A[i], b[i], rcond=None)[0]
                      for i in range(N)])
    H = np.concatenate([h, np.ones((N, 1))], axis=1).reshape(N, 3, 3)
    return H.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def warp_perspective_batch(img: jax.Array, mats: jax.Array,
                           out_hw: Tuple[int, int]) -> jax.Array:
    """Sample N crops from one image. img (H, W, C); mats (N, 3, 3) dst->src.
    Returns (N, oh, ow, C) float32, zero-padded outside the image."""
    H, W = img.shape[0], img.shape[1]
    oh, ow = out_hw
    ys = jnp.arange(oh, dtype=jnp.float32) + 0.5
    xs = jnp.arange(ow, dtype=jnp.float32) + 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")         # (oh, ow)
    ones = jnp.ones_like(gx)
    dst = jnp.stack([gx, gy, ones], axis=-1)              # (oh, ow, 3)
    f = img.astype(jnp.float32)

    def one(mat):
        src = jnp.einsum("ij,hwj->hwi", mat, dst)
        sx = src[..., 0] / jnp.maximum(src[..., 2], 1e-8) - 0.5
        sy = src[..., 1] / jnp.maximum(src[..., 2], 1e-8) - 0.5
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        wx = sx - x0
        wy = sy - y0
        valid = (sx >= -1) & (sx <= W) & (sy >= -1) & (sy <= H)
        x0c = jnp.clip(x0, 0, W - 1)
        x1c = jnp.clip(x0 + 1, 0, W - 1)
        y0c = jnp.clip(y0, 0, H - 1)
        y1c = jnp.clip(y0 + 1, 0, H - 1)
        flat = f.reshape(H * W, -1)
        def g(yy, xx):
            return jnp.take(flat, yy * W + xx, axis=0)
        out = (g(y0c, x0c) * ((1 - wx) * (1 - wy))[..., None]
               + g(y0c, x1c) * (wx * (1 - wy))[..., None]
               + g(y1c, x0c) * ((1 - wx) * wy)[..., None]
               + g(y1c, x1c) * (wx * wy)[..., None])
        return jnp.where(valid[..., None], out, 0.0)

    return jax.vmap(one)(mats)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def warp_crops_from_pages(pages: jax.Array, page_idx: jax.Array,
                          mats: jax.Array, widths: jax.Array,
                          out_hw: Tuple[int, int],
                          heights: Optional[jax.Array] = None) -> jax.Array:
    """Sample N crops, each from ITS OWN page of a stacked batch.

    pages (P, H, W, C) uint8/float; page_idx (N,) int32; mats (N, 3, 3)
    dst->src homographies; widths (N,) valid output width per crop (columns
    beyond it zero out — right padding for width-bucketed recognition);
    heights (N,) optional valid output height (rows beyond it zero out,
    matching a crop-then-warp that pads with black).
    Returns (N, oh, ow, C) float32."""
    P, H, W, C = pages.shape
    oh, ow = out_hw
    ys = jnp.arange(oh, dtype=jnp.float32) + 0.5
    xs = jnp.arange(ow, dtype=jnp.float32) + 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    dst = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)   # (oh, ow, 3)
    # channel-stack the 2x2 pixel neighborhood so ONE gather row (4C wide)
    # fetches all four bilinear corners — with C=3 pages the naive
    # per-corner gather moves 12-byte rows and runs far below HBM speed
    # (same trick as ops/deform_conv.py). Indices wrap modulo H/W; the
    # out-of-range corners die to the validity mask.
    pg = pages.astype(jnp.bfloat16)
    pq = jnp.concatenate(
        [pg,
         jnp.roll(pg, -1, axis=2),
         jnp.roll(pg, -1, axis=1),
         jnp.roll(jnp.roll(pg, -1, axis=2), -1, axis=1)],
        axis=-1).reshape(P * H * W, 4 * C)

    if heights is None:
        heights = jnp.full_like(widths, oh)

    def one(mat, pidx, vw, vh):
        src = jnp.einsum("ij,hwj->hwi", mat, dst)
        sx = src[..., 0] / jnp.maximum(src[..., 2], 1e-8) - 0.5
        sy = src[..., 1] / jnp.maximum(src[..., 2], 1e-8) - 0.5
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        wx = sx - x0
        wy = sy - y0
        valid = (sx >= -1) & (sx <= W) & (sy >= -1) & (sy <= H) \
            & (gx - 0.5 < vw) & (gy - 0.5 < vh)
        base = pidx * (H * W)
        idx = base + (y0 % H) * W + (x0 % W)
        g = jnp.take(pq, idx.reshape(-1), axis=0).astype(jnp.float32)
        g = g.reshape(oh, ow, 4, C)
        in_y0 = (y0 >= 0) & (y0 < H)
        in_y1 = (y0 + 1 >= 0) & (y0 + 1 < H)
        in_x0 = (x0 >= 0) & (x0 < W)
        in_x1 = (x0 + 1 >= 0) & (x0 + 1 < W)
        w4 = jnp.stack(
            [(1 - wx) * (1 - wy) * (in_y0 & in_x0),
             wx * (1 - wy) * (in_y0 & in_x1),
             (1 - wx) * wy * (in_y1 & in_x0),
             wx * wy * (in_y1 & in_x1)], axis=-1)        # (oh, ow, 4)
        out = (g * w4[..., None]).sum(axis=-2)
        return jnp.where(valid[..., None], out, 0.0)

    return jax.vmap(one)(mats, page_idx, widths.astype(jnp.float32),
                         heights.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("out_hw", "also_flipped"))
def resample_axis_aligned_crops(pages: jax.Array, page_idx: jax.Array,
                                boxes: jax.Array,
                                out_hw: Tuple[int, int],
                                dst_w: Optional[jax.Array] = None,
                                valid_w: Optional[jax.Array] = None,
                                valid_h: Optional[jax.Array] = None,
                                also_flipped: bool = False
                                ) -> jax.Array:
    """Fast path of :func:`warp_crops_from_pages` for AXIS-ALIGNED crops
    (every detector rect from the device-box path, every layout table
    region): bilinear vertical resample as TWO WIDE ROW-GATHERS + bilinear
    horizontal resample as ONE BATCHED MATMUL on the MXU.

    Per-pixel warp gathers move 4C-byte rows and measure ~33 ns each on
    the bench rig (256x48x640 warp = 262 ms); full-width row gathers run
    near HBM speed and the horizontal hat-function weight matrix turns the
    x-resample into an einsum — the same crops cost ~milliseconds.

    pages (P, H, W, C); page_idx (N,); boxes (N, 4) [x1, y1, x2, y2] in
    page coords; out_hw (oh, ow) static. ``dst_w`` (N,) is the horizontal
    dst extent the box maps onto (defaults ow; recognition maps each box
    onto its own aspect-preserving width). ``valid_w``/``valid_h`` zero
    the output right/bottom of the content like warp_crops_from_pages.
    Matches the generic warp for axis-aligned quads (same sample points,
    same clamp + mask semantics). Returns (N, oh, ow, C) float32.

    ``also_flipped=True`` additionally returns the 180-degree-rotated
    crop with its content realigned to [0, valid_w) horizontally; it
    assumes FULL-HEIGHT content (``valid_h`` None or == oh, which every
    caller satisfies: rec crops map boxes onto the full canvas height).
    The rotated crop's sample rows are exactly the forward crop's rows
    in reverse (sy_flip(i) == sy(oh-1-i)), so it reuses the row gathers
    and costs ONE extra hat matmul — the previous take_along_axis
    realign of the (N, oh, ow, C) stack was a 53 ms element gather per
    512-crop batch vs ~11 ms for this whole function. A partial
    ``valid_h`` would land the flipped content in rows [oh-valid_h, oh)
    where the mask zeroes it, so that combination is rejected
    (ADVICE r4 #3).
    """
    if also_flipped and valid_h is not None:
        raise ValueError(
            "also_flipped=True assumes full-height content; pass "
            "valid_h=None (the flipped realign only covers the width "
            "axis)")
    P, H, W, C = pages.shape
    oh, ow = out_hw
    n = boxes.shape[0]
    if dst_w is None:
        dst_w = jnp.full((n,), float(ow), jnp.float32)
    else:
        dst_w = dst_w.astype(jnp.float32)
    if valid_w is None:
        valid_w = jnp.full((n,), ow, jnp.int32)
    if valid_h is None:
        valid_h = jnp.full((n,), oh, jnp.int32)
    x1, y1 = boxes[:, 0], boxes[:, 1]
    x2, y2 = boxes[:, 2], boxes[:, 3]
    # MXU-friendly dtype on TPU; XLA:CPU lacks a bf16 DotThunk, so the
    # CPU test mesh computes in f32
    cdt = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16

    # vertical: sy maps the full oh range onto [y1, y2] (dst_h == oh in
    # every caller: rec/cls/TSR homographies all use the full canvas
    # height as dst extent)
    r = jnp.arange(oh, dtype=jnp.float32) + 0.5
    sy = y1[:, None] + r[None, :] * ((y2 - y1) / oh)[:, None] - 0.5
    y0 = jnp.floor(sy).astype(jnp.int32)
    wy = sy - y0
    in_y0 = (y0 >= 0) & (y0 < H)
    in_y1 = (y0 + 1 >= 0) & (y0 + 1 < H)
    rows_tbl = pages.reshape(P * H, W * C).astype(cdt)
    base = (page_idx * H)[:, None]
    g0 = jnp.take(rows_tbl, base + jnp.clip(y0, 0, H - 1), axis=0)
    g1 = jnp.take(rows_tbl, base + jnp.clip(y0 + 1, 0, H - 1), axis=0)
    w0 = ((1.0 - wy) * in_y0).astype(cdt)[..., None]
    w1 = (wy * in_y1).astype(cdt)[..., None]
    rows = (g0 * w0 + g1 * w1).reshape(n, oh, W, C)       # (N, oh, W, C)

    # horizontal: hat-function weights == bilinear with edge clamping +
    # out-of-range masking (see warp_crops_from_pages), as one matmul
    j = jnp.arange(ow, dtype=jnp.float32) + 0.5
    sx = x1[:, None] + j[None, :] * ((x2 - x1) / dst_w)[:, None] - 0.5
    s = jnp.arange(W, dtype=jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, None, :] - s[None, :, None]))
    # dot_general with output (n, oh, C, j): the j=ow free dim lands in
    # the 128-lane minor position instead of C=3 (the einsum form
    # "nrwc,nwj->nrjc" measured 6.8 ms for 16x384^2 crops on v5e; this
    # form 3.8 ms — identical values, better output tiling)
    out = jax.lax.dot_general(rows, wx.astype(cdt),
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    out = out.transpose(0, 1, 3, 2)                       # (N, oh, ow, C)

    mask = (jnp.arange(ow)[None, :] < valid_w[:, None])[:, None, :, None] \
        & (jnp.arange(oh)[None, :] < valid_h[:, None])[:, :, None, None]
    # replicate the generic warp's overall src-range validity
    vy = ((sy >= -1) & (sy <= H))[:, :, None, None]
    vx = ((sx >= -1) & (sx <= W))[:, None, :, None]
    out = jnp.where(mask & vy & vx, out, 0.0)
    if not also_flipped:
        return out
    # 180-rotated crop, content realigned to [0, valid_w) x [0, valid_h):
    # sample x runs x2 -> x1 over the SAME dst extent; sample rows are the
    # forward rows reversed along oh
    sxf = x2[:, None] - j[None, :] * ((x2 - x1) / dst_w)[:, None] - 0.5
    wxf = jnp.maximum(0.0,
                      1.0 - jnp.abs(sxf[:, None, :] - s[None, :, None]))
    outf = jax.lax.dot_general(rows[:, ::-1], wxf.astype(cdt),
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
    outf = outf.transpose(0, 1, 3, 2)
    vxf = ((sxf >= -1) & (sxf <= W))[:, None, :, None]
    return out, jnp.where(mask & vy[:, ::-1] & vxf, outf, 0.0)


def quads_axis_aligned(quads: np.ndarray, eps: float = 0.75) -> np.ndarray:
    """(N, 4, 2) ordered [tl, tr, br, bl] quads -> (N,) bool: True where
    the quad is an axis-aligned rectangle within ``eps`` px (eligible for
    resample_axis_aligned_crops)."""
    q = np.asarray(quads, np.float32).reshape(-1, 4, 2)
    if not len(q):
        return np.zeros((0,), bool)
    return ((np.abs(q[:, 0, 1] - q[:, 1, 1]) <= eps)
            & (np.abs(q[:, 3, 1] - q[:, 2, 1]) <= eps)
            & (np.abs(q[:, 0, 0] - q[:, 3, 0]) <= eps)
            & (np.abs(q[:, 1, 0] - q[:, 2, 0]) <= eps))


def crop_rotated_boxes(img: np.ndarray, quads: np.ndarray,
                       out_hw: Optional[Tuple[int, int]] = None):
    """Crop text quads out of a page image (reference crop_image,
    utils/ocr/ocr_common_utils.py:214).

    With ``out_hw`` all crops sample to one static size in a single device
    program (warp_perspective_batch). With ``out_hw=None`` each crop keeps
    its natural size (list of numpy arrays): axis-aligned quads slice
    directly; rotated quads go through cv2.warpPerspective on host.
    """
    if len(quads) == 0:
        if out_hw is None:
            return []
        return jnp.zeros((0, out_hw[0], out_hw[1], img.shape[-1]),
                         jnp.float32)
    if out_hw is not None:
        ordered = np.stack([order_points_clockwise(q) for q in quads])
        mats = perspective_matrices(ordered, out_hw)
        return warp_perspective_batch(jnp.asarray(img), jnp.asarray(mats),
                                      out_hw)

    import cv2

    H, W = img.shape[:2]
    crops = []
    for q in np.asarray(quads, np.float32).reshape(-1, 4, 2):
        o = order_points_clockwise(q)
        w = int(round(max(np.linalg.norm(o[0] - o[1]),
                          np.linalg.norm(o[3] - o[2]))))
        h = int(round(max(np.linalg.norm(o[0] - o[3]),
                          np.linalg.norm(o[1] - o[2]))))
        w, h = max(w, 1), max(h, 1)
        xs, ys = o[:, 0], o[:, 1]
        axis_aligned = (abs(ys[0] - ys[1]) < 1.0 and abs(xs[1] - xs[2]) < 1.0
                        and abs(ys[2] - ys[3]) < 1.0)
        if axis_aligned:
            x1 = int(np.clip(np.floor(xs.min()), 0, W - 1))
            y1 = int(np.clip(np.floor(ys.min()), 0, H - 1))
            x2 = int(np.clip(np.ceil(xs.max()), x1 + 1, W))
            y2 = int(np.clip(np.ceil(ys.max()), y1 + 1, H))
            crops.append(np.ascontiguousarray(img[y1:y2, x1:x2]))
        else:
            dst = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1],
                            [0, h - 1]], np.float32)
            m = cv2.getPerspectiveTransform(o.astype(np.float32), dst)
            crops.append(cv2.warpPerspective(img, m, (w, h)))
    return crops
