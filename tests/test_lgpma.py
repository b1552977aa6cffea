"""LGPMA (mmdet-structure rebuild) + RoIAlign + post_lgpma parity tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestRoiAlign:
    def test_constant_region(self):
        from pdf_table_tpu.ops.roi_align import roi_align

        feat = jnp.zeros((16, 16, 2))
        feat = feat.at[4:8, 4:8, 0].set(1.0)
        out = roi_align(feat, jnp.array([[4.0, 4.0, 8.0, 8.0]]), out_size=4)
        assert out.shape == (1, 4, 4, 2)
        assert float(np.asarray(out)[0, 1:3, 1:3, 0].mean()) > 0.8

    def test_gradient_flows(self):
        from pdf_table_tpu.ops.roi_align import roi_align

        def f(feat):
            return roi_align(feat, jnp.array([[1.0, 1.0, 6.0, 6.0]]),
                             out_size=2).sum()

        g = jax.grad(f)(jnp.ones((8, 8, 1)))
        assert float(jnp.abs(g).sum()) > 0


class TestLGPMA:
    def _cfg(self):
        from pdf_table_tpu.models.lgpma import LgpmaConfig

        return LgpmaConfig(backbone_depth=18, fpn_channels=32,
                           rpn_pre_topk=32, num_proposals=16, mask_top=8,
                           fc_dim=64, max_side=64)

    def test_forward_shapes(self):
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.lgpma import LGPMA

        cfg = self._cfg()
        model = LGPMA(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        assert out["proposals"].shape == (1, 16, 4)
        assert out["cls_probs"].shape == (1, 16, 3)
        assert out["det_boxes"].shape == (1, 16, 2, 4)
        assert out["lpma_masks"].shape == (1, 8, 28, 28, 4)
        assert out["gpma_seg"].shape[-1] == 1
        assert out["gpma_reg"].shape[-1] == 2

    def test_tsr_task_lgpma(self):
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        task = OcrTableStructureTask(
            model="Lgpma", backbone_depth=18, fpn_channels=32,
            rpn_pre_topk=32, num_proposals=16, mask_top=8, fc_dim=64,
            max_side=64, score_thresh=0.0)
        img = np.full((80, 60, 3), 255, np.uint8)
        out = task(img)
        assert out["type"] == "lgpma"
        for c in out["cells"]:
            assert "logic" in c


class TestPostLgpma:
    """post_lgpma.py behavior parity on synthetic inputs."""

    def test_bbox2adj_and_cliques_simple_grid(self):
        from pdf_table_tpu.models.lgpma.processor import (adj_to_cell,
                                                          bbox2adj)

        # 2x2 grid of cells
        boxes = np.array([[0, 0, 10, 10], [10, 0, 20, 10],
                          [0, 10, 10, 20], [10, 10, 20, 20]], float)
        adjr, adjc = bbox2adj(boxes)
        rows = adj_to_cell(adjr, boxes, "row")
        cols = adj_to_cell(adjc, boxes, "col")
        logic = [(int(r.min()), int(r.max()), int(c.min()), int(c.max()))
                 for r, c in zip(rows, cols)]
        assert logic == [(0, 0, 0, 0), (0, 0, 1, 1),
                         (1, 1, 0, 0), (1, 1, 1, 1)]

    def test_cliques_with_rowspan(self):
        from pdf_table_tpu.models.lgpma.processor import (adj_to_cell,
                                                          bbox2adj)

        # col 0 cell spans both rows; col 1 has two cells
        boxes = np.array([[0, 0, 10, 20], [10, 0, 20, 10],
                          [10, 10, 20, 20]], float)
        adjr, adjc = bbox2adj(boxes)
        rows = adj_to_cell(adjr, boxes, "row")
        logic_rows = [(int(r.min()), int(r.max())) for r in rows]
        assert logic_rows[0] == (0, 1)       # the spanning cell
        assert logic_rows[1] == (0, 0)
        assert logic_rows[2] == (1, 1)

    def test_nms_inter_classes_min_area(self):
        from pdf_table_tpu.models.lgpma.processor import nms_inter_classes

        # a small high-IoA box inside a big one: suppressed by min-area rule
        big = np.array([[0, 0, 20, 20, 0.9]], np.float32)
        small = np.array([[2, 2, 8, 8, 0.5]], np.float32)
        boxes, labels = nms_inter_classes([big, small], thresh=0.3)
        assert len(boxes) == 1 and labels == [0]

    def test_pyramid_refine_recovers_boundary(self):
        """A synthetic pyramid ramp peaked at x=mid: refined left/right
        boundaries land where the fitted plane hits zero (the true cell
        edges), even from a perturbed input box."""
        from pdf_table_tpu.models.lgpma.processor import \
            refine_box_by_pyramid

        H = W = 60
        # true cell [10, 40] x [15, 35]
        x1t, x2t, y1t, y2t = 10, 40, 15, 35
        xm = (x1t + x2t) / 2
        ym = (y1t + y2t) / 2
        soft_h = np.zeros((H, W), np.float32)
        soft_v = np.zeros((H, W), np.float32)
        text = np.zeros((H, W), np.float32)
        for y in range(y1t, y2t + 1):
            for x in range(x1t, x2t + 1):
                soft_h[y, x] = (x - x1t) / (xm - x1t) if x <= xm \
                    else (x2t - x) / (x2t - xm)
                soft_v[y, x] = (y - y1t) / (ym - y1t) if y <= ym \
                    else (y2t - y) / (y2t - ym)
        text[y1t + 3:y2t - 3, x1t + 3:x2t - 3] = 1.0
        # perturbed detection box
        box = [x1t + 2.0, y1t - 2.0, x2t - 3.0, y2t + 2.0]
        refined = refine_box_by_pyramid(box, text, soft_h, soft_v)
        assert abs(refined[0] - x1t) <= 2
        assert abs(refined[2] - x2t) <= 2
        assert abs(refined[1] - y1t) <= 2
        assert abs(refined[3] - y2t) <= 2

    def test_empty_cell_completion(self):
        from pdf_table_tpu.models.lgpma import LgpmaConfig
        from pdf_table_tpu.models.lgpma.processor import LgpmaPostProcessor

        post = LgpmaPostProcessor(LgpmaConfig(refine_bboxes=False))
        # fake raw with 3 of 4 grid cells detected (one hole at r1c1)
        P, C = 8, 2
        probs = np.zeros((1, P, C + 1), np.float32)
        det = np.zeros((1, P, C, 4), np.float32)
        cells = [[0, 0, 10, 10], [10, 0, 20, 10], [0, 10, 10, 20]]
        for i, b in enumerate(cells):
            probs[0, i, 0] = 0.9
            det[0, i, 0] = b
        raw = {"cls_probs": probs, "det_boxes": det,
               "mask_idx": np.zeros((1, 4), np.int32),
               "lpma_masks": np.zeros((1, 4, 28, 28, C + 2), np.float32)}
        out = post(raw, {"org_shape": (20, 20), "scale": (1.0, 1.0)})
        logic = sorted(tuple(c["logic"]) for c in out["cells"])
        assert (1, 1, 1, 1) in logic        # completed hole
        assert len(out["cells"]) == 4
        empty = [c for c in out["cells"] if c.get("empty")]
        assert len(empty) == 1


class TestLgpmaConvert:
    """mmcv checkpoint -> flax: full coverage + numeric parity of the
    conv/fc stacks against a hand-built torch replica with mmdet names."""

    def _torch_replica(self):
        import torch
        import torch.nn as tnn

        class Bottleneck(tnn.Module):
            def __init__(self, cin, width, stride=1):
                super().__init__()
                cout = width * 4
                self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(width)
                self.conv2 = tnn.Conv2d(width, width, 3, stride, 1,
                                        bias=False)
                self.bn2 = tnn.BatchNorm2d(width)
                self.conv3 = tnn.Conv2d(width, cout, 1, bias=False)
                self.bn3 = tnn.BatchNorm2d(cout)
                self.relu = tnn.ReLU()
                if stride != 1 or cin != cout:
                    self.downsample = tnn.Sequential(
                        tnn.Conv2d(cin, cout, 1, stride, bias=False),
                        tnn.BatchNorm2d(cout))
                else:
                    self.downsample = None

            def forward(self, x):
                idt = x if self.downsample is None else self.downsample(x)
                y = self.relu(self.bn1(self.conv1(x)))
                y = self.relu(self.bn2(self.conv2(y)))
                y = self.bn3(self.conv3(y))
                return self.relu(y + idt)

        class Backbone(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = tnn.BatchNorm2d(64)
                self.relu = tnn.ReLU()
                self.maxpool = tnn.MaxPool2d(3, 2, 1)
                cin = 64
                for i, (w, n) in enumerate(zip((64, 128, 256, 512),
                                               (3, 4, 6, 3))):
                    blocks = []
                    for j in range(n):
                        stride = 2 if (i > 0 and j == 0) else 1
                        blocks.append(Bottleneck(cin, w, stride))
                        cin = w * 4
                    setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))

            def forward(self, x):
                x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
                feats = []
                for i in range(4):
                    x = getattr(self, f"layer{i + 1}")(x)
                    feats.append(x)
                return feats

        class ConvM(tnn.Module):
            def __init__(self, cin, cout, k, p=0):
                super().__init__()
                self.conv = tnn.Conv2d(cin, cout, k, padding=p)

            def forward(self, x):
                return self.conv(x)

        class Neck(tnn.Module):
            def __init__(self):
                super().__init__()
                ins = (256, 512, 1024, 2048)
                self.lateral_convs = tnn.ModuleList(
                    [ConvM(c, 256, 1) for c in ins])
                self.fpn_convs = tnn.ModuleList(
                    [ConvM(256, 256, 3, 1) for _ in ins])

            def forward(self, feats):
                import torch.nn.functional as F

                lats = [l(f) for l, f in zip(self.lateral_convs, feats)]
                for i in range(3, 0, -1):
                    up = F.interpolate(lats[i], scale_factor=2,
                                       mode="nearest")
                    lats[i - 1] = lats[i - 1] \
                        + up[:, :, :lats[i - 1].shape[2],
                             :lats[i - 1].shape[3]]
                outs = [f(l) for f, l in zip(self.fpn_convs, lats)]
                outs.append(F.max_pool2d(outs[-1], 1, stride=2))
                return outs

        class RPN(tnn.Module):
            def __init__(self, nA=18):
                super().__init__()
                self.rpn_conv = tnn.Conv2d(256, 256, 3, padding=1)
                self.rpn_cls = tnn.Conv2d(256, nA, 1)
                self.rpn_reg = tnn.Conv2d(256, nA * 4, 1)

            def forward(self, x):
                import torch.nn.functional as F

                h = F.relu(self.rpn_conv(x))
                return self.rpn_cls(h), self.rpn_reg(h)

        class BBoxHead(tnn.Module):
            def __init__(self):
                super().__init__()
                self.shared_fcs = tnn.ModuleList(
                    [tnn.Linear(256 * 49, 1024), tnn.Linear(1024, 1024)])
                self.fc_cls = tnn.Linear(1024, 3)
                self.fc_reg = tnn.Linear(1024, 8)

            def forward(self, rois):
                import torch.nn.functional as F

                x = rois.flatten(1)
                for fc in self.shared_fcs:
                    x = F.relu(fc(x))
                return self.fc_cls(x), self.fc_reg(x)

        class MaskHead(tnn.Module):
            def __init__(self):
                super().__init__()
                self.convs = tnn.ModuleList(
                    [ConvM(256, 256, 3, 1) for _ in range(4)])
                self.upsample = tnn.ConvTranspose2d(256, 256, 2, 2)
                self.conv_logits = tnn.Conv2d(256, 4, 1)

            def forward(self, x):
                import torch.nn.functional as F

                for c in self.convs:
                    x = F.relu(c(x))
                x = F.relu(self.upsample(x))
                return torch.sigmoid(self.conv_logits(x))

        class GPMA(tnn.Module):
            def __init__(self):
                super().__init__()
                self.P4_conv = ConvM(256, 256, 3, 1)
                self.P4_1x7_conv = ConvM(256, 256, (1, 7), (0, 3))
                self.channel4_1x7_conv = ConvM(256, 256, (1, 7), (0, 3))
                self.rpn4 = ConvM(256, 256, 3, 1)
                self.conv_logits_seg = tnn.Conv2d(256, 1, 1)
                self.conv_logits_reg = tnn.Conv2d(256, 2, 1)

            def forward(self, p2):
                import torch.nn.functional as F

                x_p4 = F.relu(self.P4_conv(p2))
                x_1x7 = F.relu(self.channel4_1x7_conv(p2))
                x_p4_1x7 = F.relu(self.P4_1x7_conv(x_p4))
                x = F.relu(self.rpn4(x_p4_1x7 + x_p4 + x_1x7))
                return (torch.sigmoid(self.conv_logits_seg(x)),
                        torch.sigmoid(self.conv_logits_reg(x)))

        class Full(tnn.Module):
            def __init__(self):
                super().__init__()
                self.backbone = Backbone()
                self.neck = Neck()
                self.rpn_head = RPN()

                class RoiHead(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        self.bbox_head = BBoxHead()
                        self.mask_head = MaskHead()
                self.roi_head = RoiHead()
                self.global_seg_head = GPMA()

        torch.manual_seed(0)
        m = Full().eval()
        return m

    @pytest.fixture(scope="class")
    def converted(self):
        from pdf_table_tpu.convert.lgpma_convert import convert_lgpma
        from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.lgpma import LGPMA, LgpmaConfig

        torch_model = self._torch_replica()
        cfg = LgpmaConfig(rpn_pre_topk=16, num_proposals=16, mask_top=4)
        model = LGPMA(cfg)
        variables = jax.tree.map(
            np.asarray,
            dict(init_params(model, np.zeros((1, 64, 64, 3), np.float32))))
        src = TorchTensorSource(torch_model.state_dict())
        rep = convert_lgpma(src, variables)
        return torch_model, model, cfg, variables, rep, src

    def test_full_coverage(self, converted):
        torch_model, model, cfg, variables, rep, src = converted
        assert rep.ok, (rep.missing[:8], rep.shape_errors[:4])
        unused = [u for u in src.unused() if "num_batches" not in u]
        assert not unused, unused[:8]

    def test_backbone_fpn_rpn_parity(self, converted):
        import torch

        torch_model, model, cfg, variables, rep, src = converted
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)

        with torch.no_grad():
            feats_t = torch_model.backbone(
                torch.from_numpy(x.transpose(0, 3, 1, 2)))
            levels_t = torch_model.neck(feats_t)
            cls_t, reg_t = torch_model.rpn_head(levels_t[0])

        from pdf_table_tpu.models.lgpma.model import FPN, RPNHead
        from pdf_table_tpu.models.layers import ResNet

        feats_j = ResNet(50, name="backbone").apply(
            {"params": variables["params"]["backbone"],
             "batch_stats": variables["batch_stats"]["backbone"]},
            jnp.asarray(x), False)
        for ft, fj in zip(feats_t, feats_j):
            t = ft.numpy().transpose(0, 2, 3, 1)
            assert np.allclose(t, np.asarray(fj), atol=2e-4), \
                np.abs(t - np.asarray(fj)).max()

        fpn = FPN(256)
        levels_j = fpn.apply({"params": variables["params"]["neck"]},
                             feats_j)
        for lt, lj in zip(levels_t, levels_j):
            t = lt.numpy().transpose(0, 2, 3, 1)
            assert np.allclose(t, np.asarray(lj), atol=2e-4), \
                np.abs(t - np.asarray(lj)).max()

        rpn = RPNHead(18)
        cls_j, reg_j = rpn.apply(
            {"params": variables["params"]["rpn_head"]}, levels_j[0])
        assert np.allclose(cls_t.numpy().transpose(0, 2, 3, 1),
                           np.asarray(cls_j), atol=2e-4)
        assert np.allclose(reg_t.numpy().transpose(0, 2, 3, 1),
                           np.asarray(reg_j), atol=2e-4)

    def test_heads_parity_on_shared_rois(self, converted):
        import torch

        torch_model, model, cfg, variables, rep, src = converted
        rng = np.random.default_rng(1)
        rois = rng.standard_normal((4, 7, 7, 256)).astype(np.float32)
        rois14 = rng.standard_normal((4, 14, 14, 256)).astype(np.float32)
        p2 = rng.standard_normal((1, 16, 16, 256)).astype(np.float32)

        with torch.no_grad():
            cls_t, reg_t = torch_model.roi_head.bbox_head(
                torch.from_numpy(rois.transpose(0, 3, 1, 2)))
            mask_t = torch_model.roi_head.mask_head(
                torch.from_numpy(rois14.transpose(0, 3, 1, 2)))
            seg_t, greg_t = torch_model.global_seg_head(
                torch.from_numpy(p2.transpose(0, 3, 1, 2)))

        from pdf_table_tpu.models.lgpma.model import (GPMAMaskHead,
                                                      LPMAMaskHead,
                                                      Shared2FCBBoxHead)

        probs_j, deltas_j = Shared2FCBBoxHead(2, 1024).apply(
            {"params": variables["params"]["bbox_head"]}, jnp.asarray(rois))
        probs_t = torch.softmax(cls_t, -1).numpy()
        assert np.allclose(probs_t, np.asarray(probs_j), atol=2e-4)
        assert np.allclose(reg_t.numpy().reshape(4, 2, 4),
                           np.asarray(deltas_j), atol=2e-4)

        mask_j = LPMAMaskHead(2).apply(
            {"params": variables["params"]["mask_head"]},
            jnp.asarray(rois14))
        assert np.allclose(mask_t.numpy().transpose(0, 2, 3, 1),
                           np.asarray(mask_j), atol=2e-4)

        seg_j, greg_j = GPMAMaskHead().apply(
            {"params": variables["params"]["global_seg_head"]},
            jnp.asarray(p2))
        assert np.allclose(seg_t.numpy().transpose(0, 2, 3, 1),
                           np.asarray(seg_j), atol=2e-4)
        assert np.allclose(greg_t.numpy().transpose(0, 2, 3, 1),
                           np.asarray(greg_j), atol=2e-4)
