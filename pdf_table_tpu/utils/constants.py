"""Global, env-driven constants.

TPU-native analog of the reference's ``utils/constant.py:33`` (``Constants``):
output/cache directories, hub switches, and logging paths are resolved once
from environment variables with sane defaults under the user's home.
"""

from __future__ import annotations

import os
from pathlib import Path


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


def _env_bool(name: str, default: bool = False) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in {"1", "true", "yes", "on"}


class Constants:
    """Process-wide configuration constants (env-overridable)."""

    HOME = str(Path.home())

    # Root for everything we write.
    BASE_DIR = _env("PDFTABLE_BASE_DIR", os.path.join(HOME, ".pdf_table_tpu"))

    # Output of pipeline runs (HTML, debug renders, metrics JSON).
    OUTPUT_DIR = _env("PDFTABLE_OUTPUT_DIR", os.path.join(BASE_DIR, "outputs"))

    # Downloaded / converted model weights cache.
    MODEL_CACHE_DIR = _env("PDFTABLE_MODEL_CACHE_DIR", os.path.join(BASE_DIR, "models"))

    # Rasterized page-image cache (keyed by content hash + dpi).
    PAGE_CACHE_DIR = _env("PDFTABLE_PAGE_CACHE_DIR", os.path.join(BASE_DIR, "pages"))

    # Log file location.
    LOG_DIR = _env("PDFTABLE_LOG_DIR", os.path.join(BASE_DIR, "logs"))
    LOG_FILE = _env("PDFTABLE_LOG_FILE", os.path.join(LOG_DIR, "pdf_table_tpu.log"))
    LOG_LEVEL = _env("PDFTABLE_LOG_LEVEL", "INFO")

    # Hub selection mirrors the reference's PDFTABLE_USE_MODELSCOPE_HUB switch
    # (reference: utils/constant.py:44). Weight download is optional: with no
    # cached weights, models run randomly initialized (useful for perf work and
    # shape tests; accuracy requires converted checkpoints).
    USE_MODELSCOPE_HUB = _env_bool("PDFTABLE_USE_MODELSCOPE_HUB", False)

    # Rasterization DPI for PDF -> image conversion.
    PDF_RENDER_DPI = int(_env("PDFTABLE_RENDER_DPI", "144"))

    # Compute dtype policy for model forward passes.
    COMPUTE_DTYPE = _env("PDFTABLE_COMPUTE_DTYPE", "bfloat16")

    # Persistent XLA executable cache (analog of the reference caching its
    # converted fp16 ONNX artifacts once, deploy_utils.py:253-264): repeat
    # process launches skip the 15-40s per-model compiles.
    COMPILE_CACHE_DIR = _env("PDFTABLE_COMPILE_CACHE_DIR",
                             os.path.join(BASE_DIR, "xla_cache"))

    # Debug switches.
    DEBUG = _env_bool("PDFTABLE_DEBUG", False)

    @classmethod
    def ensure_dirs(cls) -> None:
        for d in (cls.BASE_DIR, cls.OUTPUT_DIR, cls.MODEL_CACHE_DIR,
                  cls.PAGE_CACHE_DIR, cls.LOG_DIR):
            os.makedirs(d, exist_ok=True)
