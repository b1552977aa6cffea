"""Text-detection task.

Reference: OcrDetectionTask (model/ocr_pdf/ocr_detection_task.py:30)
dispatching "db" (ModelScope torch) vs "db_pp" (Paddle ONNX). Here both are
the same flax DBNet with different configs; the device program is one jitted
apply per padded input shape.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..engine.infer_task import InferTask, TaskConfig
from ..engine.params import load_or_init
from ..models.dbnet import DBNet, DbNetConfig, DbNetPreProcessor, DbNetPostProcessor
from ..models.registry import get_config, weights_dir


class OcrDetectionTask(InferTask):
    task_name = "detection"

    def __init__(self, model: str = "PP-OCRv4_det",
                 config: Optional[DbNetConfig] = None,
                 task_config: Optional[TaskConfig] = None,
                 use_device_postprocess: bool = False, mesh=None, **kw):
        super().__init__(task_config, mesh=mesh)
        self.model_name = model
        self.model_config = config or get_config("detection", model, **kw)
        self.pre = DbNetPreProcessor(self.model_config)
        self.post = DbNetPostProcessor(self.model_config)
        self.use_device_postprocess = use_device_postprocess

    def _build_model(self):
        module = DBNet(self.model_config)
        sample = np.zeros((1, 64, 64, 3), np.float32)
        variables = load_or_init(module, sample,
                                 weights_dir("detection", self.model_name))

        def apply_fn(variables, batch):
            return module.apply(variables, batch["image"], train=False)

        return apply_fn, variables

    def _preprocess(self, inputs, **kw):
        out = self.pre(inputs)
        meta = {"org_shape": out.pop("org_shape"),
                "net_shape": out["image"].shape[1:3]}
        return out, meta

    def _postprocess(self, raw, meta):
        prob = np.asarray(raw["prob"][0])
        if self.use_device_postprocess:
            result = self.post.fast_device_boxes(prob, meta["org_shape"])
        else:
            result = self.post(prob, meta["org_shape"], meta["net_shape"])
        result["prob_shape"] = prob.shape
        return result
