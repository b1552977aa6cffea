"""PULC image-classification task (reference ClsImagePulcTask,
model/ocr_pdf/cls_image_pulc_task.py:23)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..engine.infer_task import InferTask, TaskConfig
from ..engine.params import load_or_init
from ..models.cls import (ClsPulcConfig, PPLCNetClassifier, PulcPostProcessor,
                          PulcPreProcessor)
from ..models.registry import weights_dir


class ClsImagePulcTask(InferTask):
    task_name = "cls_pulc"

    def __init__(self, task_type: str = "text_image_orientation",
                 config: Optional[ClsPulcConfig] = None,
                 task_config: Optional[TaskConfig] = None, mesh=None, **kw):
        super().__init__(task_config, mesh=mesh)
        self.model_config = config or ClsPulcConfig.for_task(task_type, **kw)
        self.pre = PulcPreProcessor(self.model_config)
        self.post = PulcPostProcessor(self.model_config)

    def _build_model(self):
        cfg = self.model_config
        module = PPLCNetClassifier(cfg)
        sample = np.zeros((1, cfg.img_size[0], cfg.img_size[1], 3),
                          np.float32)
        variables = load_or_init(
            module, sample, weights_dir("cls", "PPLCNet", cfg.task_type))

        def apply_fn(variables, batch):
            return module.apply(variables, batch["image"], train=False)

        return apply_fn, variables

    def _preprocess(self, inputs, **kw):
        return self.pre(inputs), {}

    def _postprocess(self, raw, meta):
        return self.post(np.asarray(raw[0]))

    def batch_infer(self, images) -> list:
        """All crops in ONE padded device forward (the reference loops one
        PULC call per text box, ocr_system_task.py:411-424)."""
        if not len(images):
            return []
        from ..engine.infer_task import bucket_batch_size

        self.ensure_built()
        batch = {"image": np.concatenate(
            [self.pre(img)["image"] for img in images], axis=0)}
        batch, n = self.pad_batch(batch, bucket_batch_size(len(images)))
        raw = np.asarray(self._run_model(batch))
        return [self.post(raw[i]) for i in range(n)]
