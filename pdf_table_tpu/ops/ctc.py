"""CTC greedy decoding, vectorized in XLA.

Replaces the reference's per-sequence Python loops
(ocr_recognition/processor_ocr_recognition.py:147-164 and
ocr_rec_pp/rec_postprocess.py CTCLabelDecode:167): argmax + collapse-repeats
+ blank removal as masked tensor ops; the host only maps ids to vocab.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("blank_id",))
def ctc_greedy_decode(logits: jax.Array, blank_id: int = 0):
    """logits (B, T, V) -> (ids (B, T), mask (B, T), conf (B,)).

    ``ids`` holds argmax labels; ``mask`` selects positions that survive
    collapse-repeats + drop-blank (left-aligned order is preserved by the
    host-side gather). ``conf`` is the mean probability of kept positions.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    ids = jnp.argmax(probs, axis=-1)                     # (B, T)
    pmax = jnp.max(probs, axis=-1)                       # (B, T)
    prev = jnp.concatenate([jnp.full_like(ids[:, :1], -1), ids[:, :-1]], axis=1)
    keep = (ids != blank_id) & (ids != prev)
    conf_sum = jnp.sum(pmax * keep, axis=1)
    conf_cnt = jnp.maximum(jnp.sum(keep, axis=1), 1)
    conf = conf_sum / conf_cnt
    return ids, keep, conf


def ids_to_text(ids, mask, charset, blank_id: int = 0) -> list:
    """Host-side vocab mapping. charset: id -> str (index 0 = blank)."""
    import numpy as np

    ids = np.asarray(ids)
    mask = np.asarray(mask)
    out = []
    n_chars = len(charset)
    for b in range(ids.shape[0]):
        chars = [charset[i] for i, m in zip(ids[b], mask[b])
                 if m and 0 <= i < n_chars and i != blank_id]
        out.append("".join(chars))
    return out
