"""Image pre-process task: orientation fix + small-angle deskew.

Reference: OcrTablePreprocessTask (model/ocr_pdf/ocr_table_preprocess_task.py:27)
— pre_rotate_image:85 (small-angle deskew via min-area-rect of the text
mass, utils/table/image_processing.py:500-545) and rotate_image_v2:116
(PULC text_image_orientation classifier -> rotate 0/90/180/270).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def estimate_skew_angle(image: np.ndarray, max_angle: float = 15.0) -> float:
    """Small-angle skew estimate from the min-area rect of dark pixels
    (reference rotate_image, image_processing.py:500)."""
    import cv2

    gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY) if image.ndim == 3 else image
    thr = cv2.threshold(gray, 0, 255,
                        cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU)[1]
    coords = cv2.findNonZero(thr)
    if coords is None or len(coords) < 32:
        return 0.0
    angle = cv2.minAreaRect(coords)[-1]
    if angle > 45:
        angle -= 90
    elif angle < -45:
        angle += 90
    if abs(angle) > max_angle:
        return 0.0
    return float(angle)


def estimate_skew_angle_fft(image: np.ndarray, max_angle: float = 15.0,
                            num: int = 20, size: int = 512) -> float:
    """Skew estimate via the FFT-magnitude radial projection — the device
    counterpart of the reference's dormant utility
    (utils/table/image_angle_estimator.py:100 get_angle; shipped but
    commented out at ocr_table_preprocess_task.py:106).

    Text lines create an energy ridge through the spectrum origin
    perpendicular to the text direction; the strongest radial-sum angle
    within ±max_angle is the skew. Whole estimate (adaptive threshold,
    FFT, radial gather) runs as ONE jitted device program; the reference
    runs cv2 + np.vectorize per angle on host.
    """
    import jax
    import jax.numpy as jnp

    gray = image.mean(axis=-1) if image.ndim == 3 else image
    h, w = gray.shape
    s = min(1.0, size / max(h, w))
    key = ("fft_angle", gray.shape, float(max_angle), num, size)
    fn = _FFT_ANGLE_CACHE.get(key)
    if fn is None:
        def run(g):
            if s < 1.0:
                nh, nw = int(round(h * s)), int(round(w * s))
                g = jax.image.resize(g, (nh, nw), "bilinear")
            else:
                nh, nw = h, w
            n = max(nh, nw)
            g = jnp.pad(g, ((0, n - nh), (0, n - nw)),
                        constant_values=255.0)
            # adaptive threshold of the inverted page: local gaussian mean
            # (15-px window, C=-10), like cv2.adaptiveThreshold in the
            # reference — separable blur via two 1-D convs
            inv = 255.0 - g
            k = jnp.exp(-0.5 * (jnp.arange(-7, 8) / 3.0) ** 2)
            k = k / k.sum()
            m1 = jax.scipy.signal.convolve(inv, k[None, :], mode="same")
            mean = jax.scipy.signal.convolve(m1, k[:, None], mode="same")
            binar = (inv > mean - (-10)).astype(jnp.float32) * 255.0
            mag = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(binar)))
            c = n // 2
            r = c
            t = jnp.linspace(-max_angle, max_angle,
                             int(max_angle * num * 2)) * jnp.pi / 180.0
            x = jnp.arange(r, dtype=jnp.float32)
            yy = (c + (x[None, :] * jnp.cos(t)[:, None])).astype(jnp.int32)
            xx = (c - (x[None, :] * jnp.sin(t)[:, None])).astype(jnp.int32)
            prof = mag[jnp.clip(yy, 0, n - 1),
                       jnp.clip(xx, 0, n - 1)].sum(axis=1)
            a = t[jnp.argmax(prof)] * 180.0 / jnp.pi
            return jnp.where(jnp.isclose(a, -max_angle), 0.0, a)

        fn = jax.jit(run)
        _FFT_ANGLE_CACHE[key] = fn
    return float(fn(jnp.asarray(gray, jnp.float32)))


_FFT_ANGLE_CACHE: Dict[Any, Any] = {}


def rotate_image(image: np.ndarray, angle: float,
                 border_value=(255, 255, 255)) -> np.ndarray:
    import cv2

    if abs(angle) < 1e-3:
        return image
    h, w = image.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    cos, sin = abs(m[0, 0]), abs(m[0, 1])
    nw = int(h * sin + w * cos)
    nh = int(h * cos + w * sin)
    m[0, 2] += nw / 2 - w / 2
    m[1, 2] += nh / 2 - h / 2
    return cv2.warpAffine(image, m, (nw, nh), flags=cv2.INTER_LINEAR,
                          borderValue=border_value)


def rotate_90s(image: np.ndarray, quarter_turns: int) -> np.ndarray:
    return np.ascontiguousarray(np.rot90(image, k=quarter_turns % 4))


class OcrTablePreprocessTask:
    """(image, is_pdf) -> (fixed image, info). For rasterized digital PDFs
    orientation is trusted; scanned images run deskew + the orientation
    classifier (when available)."""

    def __init__(self, use_orientation_cls: bool = True,
                 orientation_task=None):
        self.use_orientation_cls = use_orientation_cls
        self._orientation = orientation_task

    @property
    def orientation_task(self):
        if self._orientation is None and self.use_orientation_cls:
            from .cls_pulc import ClsImagePulcTask
            self._orientation = ClsImagePulcTask(
                task_type="text_image_orientation")
        return self._orientation

    def __call__(self, image: np.ndarray,
                 is_pdf: bool = False) -> Dict[str, Any]:
        info: Dict[str, Any] = {"rotate_angle": 0.0, "quarter_turns": 0}
        if is_pdf:
            return {"image": image, **info}
        angle = estimate_skew_angle(image)
        if abs(angle) > 0.3:
            image = rotate_image(image, angle)
            info["rotate_angle"] = angle
        task = self.orientation_task
        if task is not None:
            result = task(image)
            label = result.get("label", "0")
            turns = {"0": 0, "90": 1, "180": 2, "270": 3}.get(label, 0)
            # note: with unconverted (random) weights this is a no-op-quality
            # signal; structure tests pin label "0"
            if turns and result.get("score", 0.0) >= 0.75:
                image = rotate_90s(image, turns)
                info["quarter_turns"] = turns
        return {"image": image, **info}
