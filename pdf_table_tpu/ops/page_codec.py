"""Tunnel-aware page upload codec: shrink H2D bytes for the batched pipeline.

On the tunneled bench rig the chunk canvas upload is the single largest
cost of the whole pipeline (a 28 MB (8, 1280, 960, 3) uint8 stack costs
350-1400 ms depending on ambient load — micro-benchmarks, round 3; the
reference never faces this because it runs models host-adjacent,
base_infer_task.py:327-364). Document pages are overwhelmingly grayscale,
so the host encodes each chunk into a compact planar form and ONE small
jitted program reconstructs the RGB canvas stack device-side:

- ``gray``  — BT.601 luma only, 1 byte/px (3x smaller). EXACT when the
  source page is gray (R=G=B -> Y=R), which the ``auto`` mode verifies
  per chunk before choosing it.
- ``yuv420`` — full-range BT.601 luma + 2x2-subsampled chroma,
  1.5 bytes/px (2x smaller). Chroma subsampling is the JPEG/video
  standard for visually lossless photographic content; text/line art
  luma (what det/rec/TSR read) is untouched.
- ``rgb`` — passthrough (exact, 3 bytes/px).

On top of whichever planar form wins, ``auto`` applies a LOSSLESS
run-length transport when it compresses ≥4x (``rle:<inner>`` modes):
document pages are mostly white, so the planar byte stream collapses to
a few thousand runs. The host sends (run starts i32, value deltas i16)
padded to a static cap bucket; ONE jitted program reconstructs the
stream device-side as scatter(mode=drop) of the deltas into a zero
buffer + a two-level cumsum (rows, then row offsets — prefix sums of
the deltas ARE the byte values, so int16 never overflows), then runs
the inner planar decode. Measured motivation: the tunnel H2D degrades
to ~25 MB/s under ambient load (2026-08-18 probe: 9.8 MB chunk =
417 ms), where a 25x smaller upload saves ~45 ms/page; in good windows
(~3 GB/s) the extra host encode costs ~2 ms/page.

Everything downstream (detection resize, layout resize, TSR/rec crop
warps) samples the reconstructed device-resident stack unchanged.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# full-range BT.601 (JPEG/JFIF) analysis constants; the device decode
# below is the exact algebraic inverse
_KR, _KG, _KB = 0.299, 0.587, 0.114


def page_is_gray(img: np.ndarray, tol: int = 2, stride: int = 16) -> bool:
    """True if an RGB page is (near-)grayscale, checked on a subsampled
    grid (full-page check costs real milliseconds at chunk volume)."""
    if img.ndim == 2 or img.shape[-1] == 1:
        return True
    s = img[::stride, ::stride].astype(np.int16)
    return bool(np.max(np.abs(s[..., 0] - s[..., 1])) <= tol
                and np.max(np.abs(s[..., 1] - s[..., 2])) <= tol)


def encode_pages(canvases: np.ndarray, mode: str = "auto"
                 ) -> Tuple[Dict[str, np.ndarray], str]:
    """(N, H, W, 3) uint8 -> ({plane arrays}, resolved_mode).

    ``auto`` resolves to ``gray`` when every page in the chunk is gray
    (exact reconstruction), else ``yuv420`` — then layers the lossless
    RLE transport on top when it compresses >=4x.
    """
    if mode == "rgb":
        return {"rgb": canvases}, "rgb"
    rle = False
    if mode == "auto":
        rle = True
        if all(page_is_gray(c) for c in canvases):
            mode = "gray"
        else:
            mode = "yuv420"
    if mode.startswith("rle:"):      # explicit request, e.g. "rle:gray"
        rle, mode = True, mode[4:]
    if rle:
        planes, mode = encode_pages(canvases, mode)
        packed = rle_encode(planes, mode)
        return packed if packed is not None else (planes, mode)
    if mode == "gray":
        # Integer BT.601 luma. For a truly gray page (R=G=B=v) Y == v
        # exactly — same reconstruction as the old channel-0 slice. For
        # color content that slipped past the subsampled page_is_gray
        # grid (features <16 px, e.g. red stamp digits), luma keeps the
        # content visible at its perceptual brightness instead of
        # reconstructing it as channel-0 only (which turned red-on-white
        # into pure white and silently erased it from detection input)
        # — worst case is now chroma loss. cv2's SIMD conversion is
        # bit-identical to the u16 fixed-point blend and ~300x faster
        # when the host lanes contend for the CPU (measured: the numpy
        # strided blend degraded to seconds/chunk mid-pipeline).
        try:
            import cv2
            y8 = np.stack([cv2.cvtColor(c, cv2.COLOR_RGB2GRAY)
                           for c in canvases])
        except ImportError:
            x = canvases.astype(np.uint16)
            y8 = ((77 * x[..., 0] + 150 * x[..., 1] + 29 * x[..., 2]
                   + 128) >> 8).astype(np.uint8)
        return {"y": y8}, "gray"
    if mode != "yuv420":
        raise ValueError(f"unknown page codec mode: {mode}")
    if canvases.shape[1] % 2 or canvases.shape[2] % 2:
        raise ValueError("yuv420 needs even H and W (canvas buckets are "
                         f"even by construction); got {canvases.shape}")
    r = canvases[..., 0].astype(np.uint16)
    g = canvases[..., 1].astype(np.uint16)
    b = canvases[..., 2].astype(np.uint16)
    y16 = (77 * r + 150 * g + 29 * b + 128) >> 8
    # chroma from the 2x2 box-summed RGB (U/V are linear in RGB, so
    # averaging RGB first == averaging full-res chroma, at 1/4 the work;
    # bucket dims are even). Strided adds — reshape(...).mean() on the
    # 6-d view ran ~10x slower through numpy's reduce machinery.
    def box4(c):                                  # (n, h, w) u16 -> u16 sum
        return (c[:, 0::2, 0::2] + c[:, 0::2, 1::2]
                + c[:, 1::2, 0::2] + c[:, 1::2, 1::2])
    r4, g4, b4 = box4(r), box4(g), box4(b)        # 4x pixel sums, <= 1020
    # luma of the sums needs 18 bits (150*1020 overflows u16)
    y4 = (77 * r4.astype(np.int32) + 150 * g4.astype(np.int32)
          + 29 * b4.astype(np.int32) + 512) >> 8
    # 0.5/(1-K) * (C - Y) / 4 + 128, in float at quarter volume
    u2 = (0.5 / (1.0 - _KB) / 4.0) * (b4.astype(np.float32) - y4) + 128.0
    v2 = (0.5 / (1.0 - _KR) / 4.0) * (r4.astype(np.float32) - y4) + 128.0
    return {"y": y16.astype(np.uint8),
            "u": np.clip(np.round(u2), 0, 255).astype(np.uint8),
            "v": np.clip(np.round(v2), 0, 255).astype(np.uint8)}, "yuv420"


def encoded_nbytes(planes: Dict[str, np.ndarray]) -> int:
    return int(sum(a.nbytes for a in planes.values()
                   if hasattr(a, "nbytes")))


# ---------------------------------------------------------------------------
# RLE transport (lossless, on top of any planar mode)

_PLANE_ORDER = ("rgb", "y", "u", "v")
# static run-count caps -> one compiled decode program per (cap, shapes)
_RLE_CAPS = (1 << 14, 1 << 16, 1 << 18, 1 << 20)
_RLE_MIN_RATIO = 4.0        # require >=4x smaller than the planar bytes


def _plane_keys(planes: Dict[str, np.ndarray]) -> Tuple[str, ...]:
    return tuple(k for k in _PLANE_ORDER if k in planes)


def rle_encode(planes: Dict[str, np.ndarray], inner_mode: str):
    """Try to RLE-compress the concatenated plane byte stream.

    Returns (payload, f"rle:{inner_mode}") on a win, else None. Payload
    carries the padded (starts, deltas) arrays plus the static metadata
    the decoder needs (plane shapes, cap, total)."""
    keys = _plane_keys(planes)
    flat = (planes[keys[0]].ravel() if len(keys) == 1 else
            np.concatenate([planes[k].ravel() for k in keys]))
    total = flat.size
    changes = np.flatnonzero(flat[1:] != flat[:-1]).astype(np.int32) + 1
    n_runs = 1 + changes.size
    cap = next((c for c in _RLE_CAPS if n_runs <= c), None)
    if cap is None or cap * 6 * _RLE_MIN_RATIO > total:
        return None
    starts = np.empty((cap,), np.int32)
    starts[0] = 0
    starts[1:n_runs] = changes
    starts[n_runs:] = total          # out of range -> scatter drops them
    vals = flat[starts[:n_runs]].astype(np.int16)
    deltas = np.zeros((cap,), np.int16)
    deltas[0] = vals[0]
    deltas[1:n_runs] = vals[1:] - vals[:-1]
    payload = {"rle_starts": starts, "rle_deltas": deltas,
               "rle_meta": {"keys": keys,
                            "shapes": tuple(planes[k].shape for k in keys),
                            "total": total, "cap": cap}}
    return payload, f"rle:{inner_mode}"


_RLE_COLS = 4096


def _rle_reconstruct_np(starts, deltas, total):
    buf = np.zeros((total,), np.int16)
    keep = starts < total
    np.add.at(buf, starts[keep], deltas[keep])
    return np.cumsum(buf).astype(np.uint8)


def _split_planes(flat, keys, shapes):
    out, off = {}, 0
    for k, shp in zip(keys, shapes):
        n = int(np.prod(shp))
        out[k] = flat[off:off + n].reshape(shp)
        off += n
    return out


_DECODE_CACHE: Dict[tuple, object] = {}


def _inner_decode_jnp(planes, mode):
    """Planar -> (N, H, W, 3) uint8 RGB, in jnp (traceable)."""
    import jax.numpy as jnp

    if mode == "rgb":
        return planes["rgb"]
    if mode == "gray":
        y = planes["y"]
        return jnp.broadcast_to(y[..., None], y.shape + (3,))
    yf = planes["y"].astype(jnp.float32)
    uf = jnp.repeat(jnp.repeat(planes["u"].astype(jnp.float32) - 128.0,
                               2, axis=1), 2, axis=2)
    vf = jnp.repeat(jnp.repeat(planes["v"].astype(jnp.float32) - 128.0,
                               2, axis=1), 2, axis=2)
    r = yf + 2.0 * (1.0 - _KR) * vf
    b = yf + 2.0 * (1.0 - _KB) * uf
    g = (yf - _KR * r - _KB * b) / _KG
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def decode_pages_device(planes: Dict[str, np.ndarray], mode: str):
    """Upload the planes and reconstruct the (N, H, W, 3) uint8 RGB stack
    on device. Returns the device array (async)."""
    import jax
    import jax.numpy as jnp

    if mode.startswith("rle:"):
        inner = mode[4:]
        meta = planes["rle_meta"]
        keys, shapes = meta["keys"], meta["shapes"]
        total, cap = meta["total"], meta["cap"]
        key = (mode, cap, shapes)
        fn = _DECODE_CACHE.get(key)
        if fn is None:
            padded = -(-total // _RLE_COLS) * _RLE_COLS

            def run(starts, deltas):
                # scatter the value deltas at the run starts (padding
                # slots carry index == total -> dropped), then prefix-sum:
                # the running sum of deltas IS the byte value (<= 255, so
                # int16 is exact through both cumsum levels)
                buf = jnp.zeros((padded,), jnp.int16)
                buf = buf.at[starts].add(deltas, mode="drop")
                rows = buf.reshape(-1, _RLE_COLS)
                c = jnp.cumsum(rows, axis=1)
                off = jnp.cumsum(c[:, -1])
                off = jnp.concatenate(
                    [jnp.zeros((1,), c.dtype), off[:-1]])
                flat = (c + off[:, None]).reshape(-1)[:total]
                flat = flat.astype(jnp.uint8)
                out, offp = {}, 0
                for k, shp in zip(keys, shapes):
                    n = int(np.prod(shp))
                    out[k] = flat[offp:offp + n].reshape(shp)
                    offp += n
                return _inner_decode_jnp(out, inner)
            fn = jax.jit(run)
            _DECODE_CACHE[key] = fn
        return fn(jax.device_put(planes["rle_starts"]),
                  jax.device_put(planes["rle_deltas"]))

    if mode == "rgb":
        return jax.device_put(planes["rgb"])
    if mode == "gray":
        key = ("gray", planes["y"].shape)
        fn = _DECODE_CACHE.get(key)
        if fn is None:
            def run(y):
                return jnp.broadcast_to(y[..., None],
                                        y.shape + (3,))
            fn = jax.jit(run)
            _DECODE_CACHE[key] = fn
        return fn(jax.device_put(planes["y"]))

    key = ("yuv420", planes["y"].shape)
    fn = _DECODE_CACHE.get(key)
    if fn is None:
        def run(y, u, v):
            yf = y.astype(jnp.float32)
            # nearest-neighbor chroma upsample (matches the box-average
            # analysis well within 1 LSB for smooth chroma)
            uf = jnp.repeat(jnp.repeat(u.astype(jnp.float32) - 128.0,
                                       2, axis=1), 2, axis=2)
            vf = jnp.repeat(jnp.repeat(v.astype(jnp.float32) - 128.0,
                                       2, axis=1), 2, axis=2)
            r = yf + 2.0 * (1.0 - _KR) * vf
            b = yf + 2.0 * (1.0 - _KB) * uf
            g = (yf - _KR * r - _KB * b) / _KG
            rgb = jnp.stack([r, g, b], axis=-1)
            return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)
        fn = jax.jit(run)
        _DECODE_CACHE[key] = fn
    import jax
    return fn(jax.device_put(planes["y"]), jax.device_put(planes["u"]),
              jax.device_put(planes["v"]))


def decode_pages_host(planes: Dict[str, np.ndarray],
                      mode: str) -> np.ndarray:
    """Numpy reference decode (tests + host fallbacks)."""
    if mode.startswith("rle:"):
        meta = planes["rle_meta"]
        flat = _rle_reconstruct_np(planes["rle_starts"],
                                   planes["rle_deltas"], meta["total"])
        return decode_pages_host(
            _split_planes(flat, meta["keys"], meta["shapes"]), mode[4:])
    if mode == "rgb":
        return planes["rgb"]
    y = planes["y"].astype(np.float32)
    if mode == "gray":
        return np.repeat(planes["y"][..., None], 3, axis=-1)
    u = np.repeat(np.repeat(planes["u"].astype(np.float32) - 128.0,
                            2, axis=1), 2, axis=2)
    v = np.repeat(np.repeat(planes["v"].astype(np.float32) - 128.0,
                            2, axis=1), 2, axis=2)
    r = y + 2.0 * (1.0 - _KR) * v
    b = y + 2.0 * (1.0 - _KB) * u
    g = (y - _KR * r - _KB * b) / _KG
    return np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)
