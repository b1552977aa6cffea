"""Layout-analysis task.

Reference: OcrLayoutTask (model/ocr_pdf/ocr_layout_task.py:27) dispatching
picodet (ONNX) / DocXLayout (torch). Here PicoDet runs as a jitted flax
forward; DocXLayout joins the registry when implemented.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..engine.infer_task import InferTask, TaskConfig
from ..engine.params import load_or_init
from ..models.registry import get_config, weights_dir


class OcrLayoutTask(InferTask):
    task_name = "layout"

    def __init__(self, model: str = "picodet",
                 config=None, lang: str = "en",
                 task_config: Optional[TaskConfig] = None, mesh=None, **kw):
        super().__init__(task_config, mesh=mesh)
        self.model_name = model
        if model in ("DocXLayout", "docx_layout"):
            from ..models.docx_layout import (DocXLayoutConfig,
                                              DocXLayoutPostProcessor,
                                              DocXLayoutPreProcessor)
            self.model_name = "DocXLayout"
            self.model_config = config or DocXLayoutConfig(**kw)
            self.pre = DocXLayoutPreProcessor(self.model_config)
            self.post = DocXLayoutPostProcessor(self.model_config)
        else:
            from ..models.picodet import (PicoDetPostProcessor,
                                          PicoDetPreProcessor)
            if config is None:
                kw.setdefault("task_type", lang)
                config = get_config("layout", model, **kw)
            self.model_config = config
            self.pre = PicoDetPreProcessor(config)
            self.post = PicoDetPostProcessor(config)

    def _build_model(self):
        cfg = self.model_config
        if self.model_name == "DocXLayout":
            from ..models.docx_layout import DocXLayoutModel

            module = DocXLayoutModel(cfg)
            sample = np.zeros((1, cfg.resolution[0], cfg.resolution[1], 3),
                              np.float32)
            wdir = weights_dir("layout", "DocXLayout")
        else:
            from ..models.picodet import PicoDet

            module = PicoDet(cfg)
            sample = np.zeros((1, cfg.img_height, cfg.img_width, 3),
                              np.float32)
            wdir = weights_dir("layout", self.model_name, cfg.task_type)
        variables = load_or_init(module, sample, wdir)

        def apply_fn(variables, batch):
            return module.apply(variables, batch["image"], train=False)

        return apply_fn, variables

    def _preprocess(self, inputs, **kw):
        out = self.pre(inputs)
        if self.model_name == "DocXLayout":
            return out, out.pop("meta")
        meta = {"org_shape": out.pop("org_shape"),
                "scale_factor": out.pop("scale_factor")}
        return out, meta

    def _postprocess(self, raw, meta):
        if self.model_name == "DocXLayout":
            result = self.post(raw, meta)
        else:
            scores = [np.asarray(s[0]) for s in raw["scores"]]
            boxes = [np.asarray(b[0]) for b in raw["boxes"]]
            result = self.post(scores, boxes, meta["org_shape"])
        result["layout_cells"] = self.post.to_layout_cells(result)
        return result

    # -- page-batched path (batch_runner) -----------------------------------

    def batch_enqueue(self, images):
        """Stack N pages into ONE layout forward + ON-DEVICE GFL decode
        (PicoDet resizes every page to a fixed canvas, so the batch is
        static-shape; the raw head maps stay on chip and only the top-k
        candidates download — the ~10 MB/chunk head-map D2H dominated the
        tunnel wall clock). Returns the async (boxes, scores) handle +
        per-page metas; pair with :meth:`batch_finish`. The reference runs
        layout strictly per page (ocr_system_task.py:214-224)."""
        if self.model_name == "DocXLayout":
            return None, list(images)  # per-page fallback in batch_finish
        prepped = [self.pre.resize_u8(img) for img in images]
        batch = {"image_u8": np.concatenate(
            [p.pop("image_u8") for p in prepped], axis=0)}
        self.ensure_built()
        import jax
        import jax.numpy as jnp

        from ..models.picodet.processor import device_decode_topk

        key = ("batch_decode", batch["image_u8"].shape)
        fn = self._jitted.get(key)
        if fn is None:
            cfg = self.model_config
            mean = jnp.asarray(cfg.norm_mean)
            std = jnp.asarray(cfg.norm_std)

            def run(variables, b):
                x = (b["image_u8"].astype(jnp.float32) / 255.0 - mean) / std
                raw = self._apply_fn(variables, {"image": x})
                return device_decode_topk(raw, cfg)

            fn = jax.jit(run)
            self._jitted[key] = fn
        return fn(self._params, batch), prepped

    def batch_enqueue_pages(self, pages_dev):
        """Like :meth:`batch_enqueue` but from the device-resident full-res
        canvas stack: the (800, 608) resize runs on device, so layout costs
        no extra upload at all. Boxes decode in canvas coordinates
        (org_shape = canvas dims)."""
        if self.model_name == "DocXLayout":
            import numpy as np
            return None, [img for img in np.asarray(pages_dev)]
        self.ensure_built()
        import os

        import jax
        import jax.numpy as jnp

        from ..models.picodet.processor import device_decode_topk

        # device NMS: a second SMALL program runs the per-class greedy
        # suppression over the decode program's packed candidates (which
        # never leave the chip), so only the survivors (B, C, keep_top_k,
        # 5) download and the host sheds its per-page hard_nms loop
        # (~30 ms/page on the 1-core rig). Kept separate from the decode
        # program on purpose: fusing changes the big program's hash and
        # forces a full backbone recompile per shape, while this split
        # costs one extra ~0.5 ms dispatch and compiles in seconds.
        # PDFTABLE_DEVICE_NMS=0 restores host NMS.
        dev_nms = os.environ.get("PDFTABLE_DEVICE_NMS", "1") != "0"
        key = ("pages_decode", pages_dev.shape)
        fn = self._jitted.get(key)
        if fn is None:
            cfg = self.model_config
            mean = jnp.asarray(cfg.norm_mean)
            std = jnp.asarray(cfg.norm_std)

            def run(variables, pages):
                x = jax.image.resize(
                    pages.astype(jnp.float32),
                    (pages.shape[0], cfg.img_height, cfg.img_width, 3),
                    "bilinear")
                x = (x / 255.0 - mean) / std
                raw = self._apply_fn(variables, {"image": x})
                return device_decode_topk(raw, cfg)

            from ..utils.profiling import track_program
            fn = track_program(f"layout:{key[1]}", jax.jit(run))
            self._jitted[key] = fn
        P, H, W = pages_dev.shape[0], pages_dev.shape[1], pages_dev.shape[2]
        metas = [{"org_shape": (H, W), "device_nms": dev_nms}
                 for _ in range(P)]
        handle = fn(self._params, pages_dev)
        if dev_nms:
            nkey = ("pages_nms", tuple(handle.shape))
            nfn = self._jitted.get(nkey)
            if nfn is None:
                from ..models.picodet.processor import device_nms_pack
                from ..utils.profiling import track_program
                cfg = self.model_config

                def run_nms(packed):
                    return device_nms_pack(packed[..., :4],
                                           packed[..., 4:], cfg)

                nfn = track_program(f"layout_nms:{nkey[1]}",
                                    jax.jit(run_nms))
                self._jitted[nkey] = nfn
            handle = nfn(handle)
        return handle, metas

    def batch_finish(self, handle, metas):
        """Per-page postprocess of a :meth:`batch_enqueue` result ->
        [layout_cells] per page."""
        if self.model_name == "DocXLayout":
            return [self(img)["layout_cells"] for img in metas]
        import time

        from ..utils.profiling import trace_acc

        t0 = time.perf_counter()
        packed = np.asarray(handle)
        t1 = time.perf_counter()
        trace_acc("layout_d2h_wait", t1 - t0)
        out = []
        if metas and metas[0].get("device_nms"):
            for i, meta in enumerate(metas):
                result = self.post.from_device_nms(packed[i],
                                                   meta["org_shape"])
                result["layout_cells"] = self.post.to_layout_cells(result)
                out.append(result["layout_cells"])
        else:
            boxes, scores = packed[..., :4], packed[..., 4:]
            for i, meta in enumerate(metas):
                result = self.post.from_candidates(boxes[i], scores[i],
                                                   meta["org_shape"])
                result["layout_cells"] = self.post.to_layout_cells(result)
                out.append(result["layout_cells"])
        trace_acc("layout_host_nms", time.perf_counter() - t1)
        return out

    def batch_infer(self, images):
        raw, metas = self.batch_enqueue(images)
        return self.batch_finish(raw, metas)
