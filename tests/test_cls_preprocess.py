"""PULC classifier + preprocess task tests."""

import numpy as np
import pytest


class TestPPLCNet:
    def test_forward_softmax(self):
        import jax.numpy as jnp

        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.cls import ClsPulcConfig, PPLCNetClassifier

        cfg = ClsPulcConfig.for_task("textline_orientation")
        model = PPLCNetClassifier(cfg)
        x = jnp.zeros((2, 48, 192, 3), jnp.float32)
        variables = init_params(model, x)
        probs = model.apply(variables, x, train=False)
        assert probs.shape == (2, 2)
        assert np.allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)

    def test_processor_shapes(self):
        from pdf_table_tpu.models.cls import (ClsPulcConfig, PulcPreProcessor,
                                              PulcPostProcessor)

        cfg = ClsPulcConfig.for_task("text_image_orientation")
        pre = PulcPreProcessor(cfg)
        out = pre(np.zeros((300, 400, 3), np.uint8))
        assert out["image"].shape == (1, 224, 224, 3)
        post = PulcPostProcessor(cfg)
        r = post(np.array([0.1, 0.6, 0.2, 0.1]))
        assert r["label"] == "90" and abs(r["score"] - 0.6) < 1e-6

    def test_task_e2e(self):
        from pdf_table_tpu.tasks.cls_pulc import ClsImagePulcTask

        task = ClsImagePulcTask(task_type="textline_orientation", scale=0.25)
        out = task(np.full((32, 100, 3), 255, np.uint8))
        assert out["label"] in ("0_degree", "180_degree")


class TestPreprocess:
    def test_skew_estimate_and_correct(self):
        import cv2

        from pdf_table_tpu.tasks.preprocess import (estimate_skew_angle,
                                                    rotate_image)

        img = np.full((200, 300), 255, np.uint8)
        for y in range(40, 160, 24):
            cv2.line(img, (40, y), (260, y), 0, 3)
        rot = rotate_image(np.stack([img] * 3, -1), -4.0)
        est = estimate_skew_angle(rot)
        assert abs(est - 4.0) < 1.5 or abs(est + 4.0) < 1.5

    def test_skew_estimate_fft(self):
        """Device-FFT radial-projection skew estimate (the reference's
        image_angle_estimator.get_angle, shipped dormant): returns the
        CORRECTION angle in rotate_image's convention."""
        from pdf_table_tpu.tasks.preprocess import (estimate_skew_angle_fft,
                                                    rotate_image)

        rng = np.random.default_rng(0)
        img = np.full((400, 400, 3), 255, np.uint8)
        for y in range(40, 360, 28):
            for seg in range(3):
                x0 = 30 + seg * 120 + int(rng.integers(0, 20))
                img[y:y + 10, x0:x0 + 90] = 20
        for true in (-6.0, 3.0):
            rot = rotate_image(img, true)
            est = estimate_skew_angle_fft(rot)
            assert abs(est + true) < 0.6, (true, est)
        assert abs(estimate_skew_angle_fft(img)) < 0.6

    def test_rotate_90s(self):
        from pdf_table_tpu.tasks.preprocess import rotate_90s

        img = np.zeros((10, 20, 3), np.uint8)
        assert rotate_90s(img, 1).shape == (20, 10, 3)
        assert rotate_90s(img, 2).shape == (10, 20, 3)

    def test_task_pdf_passthrough(self):
        from pdf_table_tpu.tasks.preprocess import OcrTablePreprocessTask

        task = OcrTablePreprocessTask(use_orientation_cls=False)
        img = np.full((50, 60, 3), 255, np.uint8)
        out = task(img, is_pdf=True)
        assert out["image"] is img and out["quarter_turns"] == 0
