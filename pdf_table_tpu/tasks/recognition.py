"""Text-recognition task.

Reference: OcrRecognitionTask (model/ocr_pdf/ocr_recognition_task.py:28) —
there the pipeline calls it once *per text box* (ocr_system_task.py:309-314,
hot loop #2). Here the whole page's crops go through width-bucketed batches:
one jitted forward per (width-bucket, batch-bucket) pair, so a page costs a
handful of device programs regardless of box count.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np

from ..engine.infer_task import InferTask, TaskConfig
from ..engine.params import load_or_init
from ..models.rec_ctc import (Charset, CTCRecModel, RecConfig,
                              RecPostProcessor, RecPreProcessor)
from ..models.registry import get_config, weights_dir


def unpack_rec(packed, real_n: int):
    """[ids | keep | conf*1e6] int32 -> (ids, keep, conf) for real_n rows."""
    arr = np.asarray(packed)[:real_n]
    T = (arr.shape[1] - 1) // 2
    return (arr[:, :T], arr[:, T:2 * T].astype(bool),
            arr[:, -1].astype(np.float32) / 1e6)


class OcrRecognitionTask(InferTask):
    task_name = "recognition"

    def __init__(self, model: str = "PP-OCRv4_rec",
                 config: Optional[RecConfig] = None,
                 task_config: Optional[TaskConfig] = None, mesh=None, **kw):
        super().__init__(task_config, mesh=mesh)
        self.model_name = model
        self.model_config = config or get_config("recognition", model, **kw)
        self.pre = RecPreProcessor(self.model_config)
        self.post = RecPostProcessor(self.model_config,
                                     charset=self._resolve_charset())

    def _resolve_charset(self) -> Charset:
        """Charset for decode: the converted-weights dir is searched first
        (the converter copies the snapshot's dict file there, mirroring the
        reference's hub-snapshot layout, rec_postprocess.py
        BaseRecLabelDecode:17). With converted weights present, a
        generic-fallback charset is a hard error — its ids do not match
        the checkpoint and every decode would be silently wrong."""
        from ..engine.params import has_saved_params
        from ..models.rec_ctc.charset import resolve_charset

        cfg = self.model_config
        wdir = self._weights_dir()
        converted = has_saved_params(wdir)
        cs = resolve_charset(cfg.charset_name, cfg.use_space_char,
                             extra_dirs=(wdir,), strict=converted)
        if converted and getattr(cs, "generic_fallback", False):
            raise RuntimeError(
                f"converted weights at {wdir!r} but charset "
                f"{cfg.charset_name!r} resolved to the generic fallback — "
                f"ship the checkpoint's dict file next to the weights")
        return cs

    def _weights_dir(self) -> str:
        cfg = self.model_config
        lang = "" if cfg.charset_name in ("en", "") \
            or os.path.sep in str(cfg.charset_name) else cfg.charset_name
        return weights_dir("recognition", self.model_name, lang)

    @property
    def charset(self) -> Charset:
        return self.post.charset

    def _build_model(self):
        cfg = self.model_config
        module = CTCRecModel(cfg)
        sample = np.zeros((1, cfg.img_height, cfg.width_buckets[0],
                           cfg.img_channels), np.float32)
        # lang-keyed weight dirs, reference-style (PP-OCRv4_rec_ch etc.)
        variables = load_or_init(module, sample, self._weights_dir())
        # normalization on device: crops upload as uint8
        # (PP rec: x/127.5-1; ConvNextViT: x/255 — processor refs)
        convnext = cfg.backbone == "convnext_vit"
        blank_id = cfg.blank_id

        def apply_fn(variables, batch):
            import jax.numpy as jnp

            from ..ops.ctc import ctc_greedy_decode

            x = batch["image"].astype(jnp.float32)
            x = x / 255.0 if convnext else x / 127.5 - 1.0
            logits = module.apply(variables, x, train=False)
            if convnext:
                # chunk logits must concatenate along time on the host
                # before CTC collapse — return raw
                return {"logits": logits}
            # fuse CTC greedy decode into the forward: ONE device program,
            # and the downlink shrinks to a single packed int32 array
            # [ids | keep | conf*1e6] — each extra D2H array costs a
            # ~40 ms tunnel round trip
            ids, keep, conf = ctc_greedy_decode(logits, blank_id=blank_id)
            packed = jnp.concatenate(
                [ids.astype(jnp.int32), keep.astype(jnp.int32),
                 jnp.round(conf * 1e6).astype(jnp.int32)[:, None]], axis=1)
            return {"rec_packed": packed}

        return apply_fn, variables

    def _preprocess(self, inputs: Sequence[np.ndarray], **kw):
        out = self.pre(inputs)
        return out, {"n": out["n"]}

    def _run_model(self, batch):
        self.ensure_built()
        # enqueue every bucket group's program before touching any result:
        # group k's downlink rides the tunnel while k+1 computes
        pending = []
        for group in batch["groups"]:
            imgs, real_n = self.pad_batch({"image": group["images"]})
            fn = self._get_jitted(imgs["image"].shape)
            pending.append((fn(self._params, imgs), real_n, group))
        results = []
        for out, real_n, group in pending:
            chunks = group.get("chunked")
            if "logits" in out:
                logits = out["logits"][:real_n]
                if chunks:
                    # (3N, T, V) -> (N, 3T, V): chunk logits concatenate
                    # along time before CTC collapse (ConvNextViT chunking)
                    n = real_n // chunks
                    T, V = logits.shape[1], logits.shape[2]
                    logits = logits.reshape(n, chunks * T, V)
                results.append({"logits": logits,
                                "indices": group["indices"]})
            else:
                results.append({"decoded": unpack_rec(out["rec_packed"],
                                                      real_n),
                                "indices": group["indices"]})
        return results

    def _get_jitted(self, shape):
        key = ("apply", shape)
        fn = self._jitted.get(key)
        if fn is None:
            fn = jax.jit(self._apply_fn)
            self._jitted[key] = fn
        return fn

    def _postprocess(self, raw, meta):
        n = meta["n"]
        texts: List[str] = [""] * n
        scores: List[float] = [0.0] * n
        for group in raw:
            self.post(group.get("logits"), group["indices"], n, texts,
                      scores, decoded=group.get("decoded"))
        return {"texts": texts, "scores": scores}
