"""Layout (PicoDet) + TSR (LORE) model/task tests on tiny shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestPicoDet:
    def test_forward_levels(self):
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.picodet import PicoDet, PicoDetConfig

        cfg = PicoDetConfig(task_type="en", img_height=128, img_width=128,
                            neck_channels=32, head_convs=1)
        model = PicoDet(cfg)
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        assert len(out["scores"]) == 4
        # strides 8,16,32,64 -> HW: 256, 64, 16, 4
        assert out["scores"][0].shape == (1, 256, 5)
        assert out["boxes"][0].shape == (1, 256, 32)  # 4*(7+1)
        s = np.asarray(out["scores"][0])
        assert (s >= 0).all() and (s <= 1).all()

    def test_postprocess_decodes_peak(self):
        from pdf_table_tpu.models.picodet import (PicoDetConfig,
                                                  PicoDetPostProcessor)

        cfg = PicoDetConfig(task_type="en", img_height=64, img_width=64,
                            score_threshold=0.3)
        post = PicoDetPostProcessor(cfg)
        scores, boxes = [], []
        for stride in cfg.strides:
            hw = (64 // stride) ** 2
            s = np.zeros((hw, cfg.num_classes), np.float32)
            b = np.zeros((hw, 4 * (cfg.reg_max + 1)), np.float32)
            if stride == 8:
                s[10, 3] = 0.9  # a "table" at cell 10
                b[10] = np.tile(np.eye(8)[4] * 10, 4)  # distance ~4 bins
            scores.append(s)
            boxes.append(b)
        out = post(scores, boxes, (64, 64))
        assert len(out["bboxs"]) == 1
        assert out["bboxs"][0]["label"] == "table"
        cells = post.to_layout_cells(out)
        from pdf_table_tpu.entity.enums import HtmlContentType
        assert cells[0].cell_type == HtmlContentType.TABLE

    def test_device_nms_matches_host_nms(self):
        """device_decode_nms (fused greedy NMS on device) must reproduce
        the host path (device_decode_topk -> from_candidates) exactly:
        same survivors, same global ordering, same rescaled boxes."""
        from pdf_table_tpu.models.picodet import (PicoDetConfig,
                                                  PicoDetPostProcessor)
        from pdf_table_tpu.models.picodet.processor import (
            device_decode_nms, device_decode_topk)

        cfg = PicoDetConfig(task_type="en", img_height=64, img_width=64,
                            score_threshold=0.3)
        post = PicoDetPostProcessor(cfg)
        rng = np.random.default_rng(7)
        raw = {"scores": [], "boxes": []}
        B = 2
        for stride in cfg.strides:
            hw = (64 // stride) ** 2
            # dense random candidates: many pass the 0.3 threshold and
            # the random boxes overlap, so NMS does real suppression
            raw["scores"].append(jnp.asarray(
                rng.uniform(0, 1, (B, hw, cfg.num_classes)).astype(
                    np.float32)))
            raw["boxes"].append(jnp.asarray(
                rng.normal(0, 2, (B, hw, 4 * (cfg.reg_max + 1))).astype(
                    np.float32)))
        packed_host = np.asarray(device_decode_topk(raw, cfg))
        packed_dev = np.asarray(device_decode_nms(raw, cfg))
        for i in range(B):
            want = post.from_candidates(packed_host[i, :, :4],
                                        packed_host[i, :, 4:], (64, 64))
            got = post.from_device_nms(packed_dev[i], (64, 64))
            assert len(got["bboxs"]) == len(want["bboxs"])
            assert len(want["bboxs"]) > 3   # the fixture exercises NMS
            for g, w in zip(got["bboxs"], want["bboxs"]):
                assert g["label"] == w["label"]
                assert g["category_id"] == w["category_id"]
                np.testing.assert_allclose(g["score"], w["score"],
                                           rtol=1e-5)
                np.testing.assert_allclose(g["bbox"], w["bbox"],
                                           rtol=1e-4, atol=1e-4)

    def test_layout_task(self):
        from pdf_table_tpu.tasks.layout import OcrLayoutTask

        task = OcrLayoutTask(model="picodet", lang="en", img_height=64,
                             img_width=64, neck_channels=32, head_convs=1)
        img = np.full((100, 80, 3), 255, np.uint8)
        out = task(img)
        assert "bboxs" in out and "layout_cells" in out


class TestLore:
    def _tiny_cfg(self):
        from pdf_table_tpu.models.lore import LoreConfig

        return LoreConfig(backbone="resnet18", resolution=(64, 64),
                          max_objs=8, hidden_size=32, head_conv=16,
                          tsfm_layers=1, stacking_layers=1, num_heads=4,
                          max_fmp_size=64)

    def test_forward_shapes(self):
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.lore import LoreModel

        cfg = self._tiny_cfg()
        model = LoreModel(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        assert out["dets"].shape == (1, 8, 8)
        assert out["logi"].shape == (1, 8, 4)
        assert out["stacked_logi"].shape == (1, 8, 4)
        assert out["valid"].dtype == jnp.bool_
        assert np.all(np.asarray(out["logi"]) >= 0)  # relu'd axes

    def test_dla_forward(self):
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.lore import LoreConfig, LoreModel

        cfg = LoreConfig(backbone="dla34", resolution=(64, 64), max_objs=4,
                         hidden_size=32, head_conv=16, tsfm_layers=1,
                         stacking_layers=1, num_heads=4, max_fmp_size=64)
        model = LoreModel(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        assert out["dets"].shape == (1, 4, 8)

    def test_preprocessor_affine(self):
        from pdf_table_tpu.models.lore import LorePreProcessor

        cfg = self._tiny_cfg()
        pre = LorePreProcessor(cfg)
        img = np.full((100, 50, 3), 128, np.uint8)
        out = pre(img)
        assert out["image"].shape == (1, 64, 64, 3)
        assert out["meta"]["s"] == 100.0
        assert out["meta"]["out_w"] == 16

    def test_postprocessor_roundtrip(self):
        from pdf_table_tpu.models.lore import LorePostProcessor

        cfg = self._tiny_cfg()
        post = LorePostProcessor(cfg)
        K = cfg.max_objs
        dets = np.zeros((1, K, 8), np.float32)
        # one valid cell occupying fmap box (2,2)-(6,4) as 4 corners
        dets[0, 0] = [2, 2, 6, 2, 6, 4, 2, 4]
        scores = np.zeros((1, K), np.float32)
        scores[0, 0] = 0.9
        valid = scores >= cfg.vis_thresh
        logi = np.zeros((1, K, 4), np.float32)
        logi[0, 0] = [0.1, 0.9, 1.2, 1.8]
        raw = {"dets": dets, "scores": scores, "valid": valid,
               "stacked_logi": logi}
        meta = {"c": np.zeros(2), "s": 100.0, "org_shape": (100, 50),
                "out_h": 16, "out_w": 16}
        out = post(raw, meta)
        assert len(out["cells"]) == 1
        cell = out["cells"][0]
        # fmap x=2 -> image x = 2 * (100/16) = 12.5
        assert abs(cell["bbox"][0] - 12.5) < 1e-3
        assert cell["logic"] == [0, 1, 1, 2]

    def test_tsr_task_e2e(self):
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        task = OcrTableStructureTask(
            model="Lore", task_type="wireless", backbone="resnet18",
            resolution=(64, 64), max_objs=8, hidden_size=32, head_conv=16,
            tsfm_layers=1, stacking_layers=1, num_heads=4, max_fmp_size=64)
        img = np.full((80, 60, 3), 255, np.uint8)
        out = task(img)
        assert "cells" in out


class TestRoundLogits:
    def test_rounding(self):
        from pdf_table_tpu.models.lore.processor import round_logits

        x = np.array([[0.4, 0.5, 1.49, 2.51]])
        assert round_logits(x).tolist() == [[0, 1, 1, 3]]


class TestBatchTsr:
    def test_batch_infer_matches_single(self):
        import numpy as np

        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        task = OcrTableStructureTask(
            model="Lore", task_type="wireless", backbone="resnet18",
            resolution=(64, 64), max_objs=8, hidden_size=32, head_conv=16,
            tsfm_layers=1, stacking_layers=1, num_heads=4, max_fmp_size=64)
        rng = np.random.default_rng(0)
        crops = [rng.integers(0, 255, (70, 50, 3)).astype(np.uint8)
                 for _ in range(3)]
        batched = task.batch_infer(crops)
        singles = [task(c) for c in crops]
        assert len(batched) == 3
        for b, s in zip(batched, singles):
            assert len(b["cells"]) == len(s["cells"])


class TestSystemBatchedTsr:
    def test_layout_routed_tables_batch(self):
        from pdf_table_tpu.entity.enums import HtmlContentType
        from pdf_table_tpu.entity.ocr_cell import OcrCell
        from pdf_table_tpu.models.rec_ctc import RecConfig
        from pdf_table_tpu.pipeline.system import (OcrSystemConfig,
                                                   OcrSystemTask)
        from pdf_table_tpu.tasks.detection import OcrDetectionTask
        from pdf_table_tpu.tasks.recognition import OcrRecognitionTask
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        cfg = OcrSystemConfig(use_layout=True, use_table=True,
                              use_orientation_cls=False)
        st = OcrSystemTask(cfg)
        st._det = OcrDetectionTask(model="PP-OCRv4_det", inner_channels=48,
                                   limit_side_len=96)
        st._rec = OcrRecognitionTask(config=RecConfig(width_buckets=(80,)))
        st._tsr = OcrTableStructureTask(
            model="Lore", task_type="wireless", backbone="resnet18",
            resolution=(64, 64), max_objs=8, hidden_size=32, head_conv=16,
            tsfm_layers=1, stacking_layers=1, num_heads=4, max_fmp_size=64)

        class FakeLayout:
            def __call__(self, image):
                cells = []
                for bb in ((5, 5, 60, 50), (5, 60, 60, 110)):
                    c = OcrCell.from_bbox(bb, text="table", score=0.9)
                    c.cell_type = HtmlContentType.TABLE
                    cells.append(c)
                return {"layout_cells": cells}

        st._layout = FakeLayout()
        img = np.full((120, 100, 3), 255, np.uint8)
        out = st(image=img)
        assert len(out.table_structures) == 2
        assert len(out.table_html) == 2


class TestWizRevFromPages:
    def test_pipelined_two_phase_matches_serial(self):
        """batch_infer_from_pages pipelines wiz_rev's two device programs
        across sub-batches; its results must match the serial per-sub-batch
        apply_fn on the SAME warped crops."""
        import jax
        import numpy as np

        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         task_type="wtw", wiz_rev=True, max_objs=4,
                         max_corners=8, hidden_size=32, tsfm_layers=1,
                         stacking_layers=1, num_heads=2, d_ff=32,
                         head_conv=16, vis_thresh=0.0)
        task = OcrTableStructureTask(model="Lore", config=cfg)
        task.config.batch_size = 1      # force multiple sub-batches
        rng = np.random.default_rng(3)
        pages = rng.integers(0, 256, (2, 96, 96, 3), np.uint8)
        pages_dev = jax.device_put(pages)
        regions = [(0, (0, 0, 60, 50)), (1, (10, 10, 80, 76)),
                   (0, (30, 40, 90, 90))]
        out = task.batch_infer_from_pages(pages_dev, regions)
        assert len(out) == 3
        assert task._wiz_parts is not None
        # serial oracle: same warp program, per-crop apply_fn
        from pdf_table_tpu.ops.warp import resample_axis_aligned_crops
        for r, (pi, (x1, y1, x2, y2)) in zip(out, regions):
            assert isinstance(r, dict) and "cells" in r
            s = max(y2 - y1, x2 - x1, 1.0)
            box = np.array([[x1, y1, x1 + s, y1 + s]], np.float32) \
                if cfg.upper_left else None
            assert box is not None  # wtw LORE is upper_left
            crops = resample_axis_aligned_crops(
                pages_dev, np.asarray([pi], np.int32), box, (64, 64),
                valid_w=np.asarray(
                    [min(int(np.ceil((x2 - x1) * 64 / s)), 64)], np.int32),
                valid_h=np.asarray(
                    [min(int(np.ceil((y2 - y1) * 64 / s)), 64)], np.int32))
            from pdf_table_tpu.models.lore.processor import LorePreProcessor
            x = (np.asarray(crops)[..., ::-1] / 255.0
                 - LorePreProcessor.MEAN) / LorePreProcessor.STD
            raw = task._apply_fn(task._params,
                                 {"image": x.astype(np.float32)})
            oracle = task._unpack_lore(np.asarray(raw["packed"]))
            got_n = len(r["cells"])
            want_n = int((oracle["scores"][0] > cfg.vis_thresh).sum()) \
                if "scores" in oracle else None
            if want_n is not None:
                assert got_n == want_n


class TestLoreFirstCallUnbuilt:
    def test_direct_call_builds_and_runs(self):
        """Regression: the first direct __call__ on a fresh Lore task must
        route through the split-program path (the flag is set during
        ensure_built; checking it before building jitted the host-side
        composite and crashed on wiz_rev tracers)."""
        import numpy as np

        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         task_type="wtw", wiz_rev=True, max_objs=4,
                         max_corners=8, hidden_size=32, tsfm_layers=1,
                         stacking_layers=1, num_heads=2, d_ff=32,
                         head_conv=16, vis_thresh=0.0)
        task = OcrTableStructureTask(model="Lore", config=cfg)
        img = np.full((80, 90, 3), 255, np.uint8)
        out = task(img)           # no ensure_built() beforehand
        assert out["type"] == "lore"


class TestTsrResolutionBuckets:
    def test_from_pages_buckets_and_order(self):
        """Crop-resolution bucketing (r3 perf): small regions run the
        small program; result order matches the region order."""
        import jax
        import numpy as np

        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        task = OcrTableStructureTask(
            model="Lore", resolution=(64, 64), max_objs=8, hidden_size=32,
            head_conv=16, tsfm_layers=1, stacking_layers=1, num_heads=4,
            max_fmp_size=64, res_buckets=(32,))
        assert task.res_buckets == (32,)
        pages = np.full((2, 96, 96, 3), 255, np.uint8)
        pages_dev = jax.device_put(pages)
        regions = [(0, (0, 0, 24, 20)),    # small -> 32 bucket
                   (1, (0, 0, 90, 90)),    # large -> full 64
                   (0, (40, 40, 64, 60))]  # small -> 32 bucket
        out = task.batch_infer_from_pages(pages_dev, regions)
        assert len(out) == 3
        assert all(isinstance(r, dict) and "cells" in r for r in out)
        # the small program really compiled at the bucket
        keys = [k for k in task._jitted if k and k[0] == "lore_fused"]
        resolutions = {k[2] for k in keys}
        assert (32, 32) in resolutions and (64, 64) in resolutions

    def test_res_buckets_disabled(self):
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        task = OcrTableStructureTask(
            model="Lore", resolution=(64, 64), max_objs=8, hidden_size=32,
            head_conv=16, tsfm_layers=1, stacking_layers=1, num_heads=4,
            max_fmp_size=64, res_buckets=())
        assert task.res_buckets == ()
