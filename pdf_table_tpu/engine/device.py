"""Device/dtype policy helpers (reference role: DeployUtils device placement,
utils/deploy_utils.py:227; fp16 switch base_infer_task.py:56 -> bf16 here)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.constants import Constants

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "float16": jnp.float16,
}


def compute_dtype():
    """Model forward dtype: bf16 on TPU by default, f32 elsewhere unless
    overridden via PDFTABLE_COMPUTE_DTYPE."""
    name = Constants.COMPUTE_DTYPE.lower()
    dt = _DTYPES.get(name, jnp.bfloat16)
    if dt == jnp.bfloat16 and default_backend() == "cpu":
        # CPU bf16 matmuls are emulated and slow; tests force cpu anyway.
        return jnp.float32
    return dt


def default_backend() -> str:
    try:
        return jax.default_backend()
    except RuntimeError:
        return "cpu"


_compile_cache_on = False


def enable_compile_cache() -> None:
    """Turn on jax's persistent compilation cache under
    Constants.COMPILE_CACHE_DIR (idempotent; respects an explicit user
    jax_compilation_cache_dir, e.g. the test conftest's)."""
    global _compile_cache_on
    if _compile_cache_on:
        return
    _compile_cache_on = True
    import os

    if jax.config.jax_compilation_cache_dir:
        return
    try:
        os.makedirs(Constants.COMPILE_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          Constants.COMPILE_CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:   # cache is best-effort; never block inference
        pass
