"""Parameter init / load / save.

The reference downloads torch or onnx checkpoints from HF/ModelScope
(common_utils.py:465, base_infer_task.py:146-169). Here params are flax
pytrees: converted weights live as orbax checkpoints under the model cache;
absent weights fall back to deterministic random init (seed 0) so structure
and flow are testable hermetically.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..utils.logging_utils import logger


def commit_params(variables):
    """Commit a params pytree to the default device ONCE.

    orbax restore (load_params) returns HOST numpy leaves; passing those
    to a jitted apply re-uploads every leaf on EVERY call — on the
    tunneled TPU this dominated the det forward (trace: ~90 ms/call of
    tiny f32 copy-start transfers vs ~24 ms of actual XLA module time),
    and it silently penalizes exactly the production case (converted
    checkpoints) while random-init params are already device-resident.
    One batched device_put here makes every later call upload-free."""
    if variables is None:
        return None
    return jax.device_put(variables)


def init_params(module, sample_inputs, seed: int = 0, train: bool = False):
    """Initialize flax module variables (params + batch_stats).

    Jitted: one compiled program instead of per-op eager dispatch, and the
    executable lands in the persistent compilation cache."""
    rng = jax.random.PRNGKey(seed)
    init_fn = jax.jit(lambda r, x: module.init({"params": r}, x, train=train))
    return init_fn(rng, sample_inputs)


def save_params(variables, ckpt_dir: str) -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(os.path.dirname(ckpt_dir), exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(ckpt_dir, jax.tree.map(np.asarray, variables), force=True)
    logger.info("saved params to %s", ckpt_dir)


_async_ckptr = None


def save_params_async(variables, ckpt_dir: str):
    """Non-blocking checkpoint save: the device->host transfer is enqueued
    here (async dispatch) and orbax's AsyncCheckpointer writes on a
    background thread, so the train loop's next step overlaps the ~seconds
    of D2H + filesystem time a synchronous save costs (the reference
    trainer saves synchronously through HF Trainer, basic_trainer.py:87).
    Returns the checkpointer; call :func:`wait_for_async_saves` (or the
    returned object's ``wait_until_finished``) before reading the
    checkpoint or exiting."""
    global _async_ckptr
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(os.path.dirname(ckpt_dir), exist_ok=True)
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    else:
        # one save in flight at a time: orbax requires the previous
        # commit to finish before the next save on the same checkpointer
        _async_ckptr.wait_until_finished()
    # start every leaf's D2H now (async dispatch) so orbax's background
    # thread finds ready host copies instead of serializing transfers;
    # converting with np.asarray HERE would block the train loop instead
    for leaf in jax.tree.leaves(variables):
        try:
            leaf.copy_to_host_async()
        except AttributeError:
            pass
    _async_ckptr.save(ckpt_dir, variables, force=True)
    logger.info("async save started -> %s", ckpt_dir)
    return _async_ckptr


def wait_for_async_saves() -> None:
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def load_params(ckpt_dir: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(ckpt_dir))


def has_saved_params(ckpt_dir: Optional[str]) -> bool:
    """True when a converted checkpoint exists at ``ckpt_dir`` (the same
    test load_or_init uses before restoring). Sidecar txt files alone
    (dicts copied next to weights) don't count."""
    if not (ckpt_dir and os.path.isdir(ckpt_dir)):
        return False
    return any(not n.endswith(".txt") for n in os.listdir(ckpt_dir))


def load_or_init(module, sample_inputs, ckpt_dir: Optional[str] = None,
                 seed: int = 0, task_name: str = ""):
    """Restore converted weights if present, else deterministic init.

    Random init is correct for hermetic tests/training-from-scratch but
    produces confident garbage in production inference, so the fallback
    WARNS loudly (one line per task) naming the converter entry point —
    the reference never runs un-initialized models (it always downloads,
    base_infer_task.py:146-169). Set PDF_TABLE_TPU_ALLOW_RANDOM_INIT=quiet
    to silence (the test suite does).
    """
    if has_saved_params(ckpt_dir):
        try:
            variables = load_params(ckpt_dir)
            logger.info("restored params from %s", ckpt_dir)
            return variables
        except Exception as e:  # corrupted / layout drift -> re-init
            logger.warning("restore failed (%s); falling back to init", e)
    if os.environ.get("PDF_TABLE_TPU_ALLOW_RANDOM_INIT", "") != "quiet":
        logger.warning(
            "[%s] no converted weights at %r — running with RANDOM weights "
            "(outputs will be garbage); convert a checkpoint with "
            "tools/convert_weights.py", task_name or module.__class__.__name__,
            ckpt_dir)
    return init_params(module, sample_inputs, seed=seed)
