import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from pdf_table_tpu.ops import (
    batch_resize_pad_normalize,
    component_boxes,
    connected_components,
    crop_rotated_boxes,
    ctc_greedy_decode,
    decode_boxes_4ps,
    deform_conv2d,
    hard_nms,
    heatmap_nms,
    order_points_clockwise,
    resize_bilinear,
    resize_pad_normalize,
)
from pdf_table_tpu.ops.ctc import ids_to_text
from pdf_table_tpu.ops.deform_conv import deform_conv2d_reference_numpy
from pdf_table_tpu.ops.image import pack_images


class TestResize:
    def test_resize_matches_cv2(self, rng):
        img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
        out = np.asarray(resize_bilinear(jnp.asarray(img), (64, 96)))
        ref = cv2.resize(img.astype(np.float32), (96, 64), interpolation=cv2.INTER_LINEAR)
        assert np.abs(out - ref).max() < 1.5

    def test_resize_pad_normalize_keep_ratio(self, rng):
        img = rng.integers(0, 255, (100, 50, 3), dtype=np.uint8)
        out, valid = resize_pad_normalize(jnp.asarray(img), (100, 50), (64, 64),
                                          mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
        out = np.asarray(out)
        vh, vw = np.asarray(valid)
        assert out.shape == (64, 64, 3)
        assert vh == 64 and vw == 32  # aspect kept
        # padding area is exactly zero
        assert np.all(out[:, 32:] == 0)
        # content area is normalized to [-1, 1]
        assert -1.01 <= out[:, :32].min() and out[:, :32].max() <= 1.01

    def test_batch_pack_and_preprocess(self, rng):
        imgs = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                for h, w in [(40, 60), (80, 30), (64, 64)]]
        buf, hw = pack_images(imgs)
        assert buf.shape[0] == 3 and buf.shape[1] % 32 == 0
        out, valid = batch_resize_pad_normalize(jnp.asarray(buf), jnp.asarray(hw),
                                                (48, 48))
        assert out.shape == (3, 48, 48, 3)
        assert np.asarray(valid).shape == (3, 2)


class TestWarp:
    def test_order_points(self):
        quad = np.array([[10, 10], [50, 12], [48, 40], [8, 42]], np.float32)
        shuffled = quad[[2, 0, 3, 1]]
        ordered = order_points_clockwise(shuffled)
        np.testing.assert_allclose(ordered, quad)

    def test_crop_axis_aligned(self, rng):
        img = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
        quad = np.array([[20, 30], [70, 30], [70, 60], [20, 60]], np.float32)
        crops = np.asarray(crop_rotated_boxes(img, quad[None], (30, 50)))
        assert crops.shape == (1, 30, 50, 3)
        ref = img[30:60, 20:70].astype(np.float32)
        assert np.abs(crops[0] - ref).mean() < 2.0

    def test_crop_rotated_matches_cv2(self, rng):
        img = rng.integers(0, 255, (120, 120, 3), dtype=np.uint8)
        img = cv2.GaussianBlur(img, (5, 5), 2)  # smooth: interp differences shrink
        center, size, angle = (60, 60), (60, 30), 25
        rect = cv2.boxPoints((center, size, angle))  # 4x2
        quad = order_points_clockwise(rect)
        out_hw = (30, 60)
        crops = np.asarray(crop_rotated_boxes(img, quad[None], out_hw))
        M = cv2.getPerspectiveTransform(
            quad.astype(np.float32),
            np.array([[0, 0], [60, 0], [60, 30], [0, 30]], np.float32))
        ref = cv2.warpPerspective(img.astype(np.float32), M, (60, 30))
        # interiors should agree closely
        diff = np.abs(crops[0][4:-4, 4:-4] - ref[4:-4, 4:-4])
        assert diff.mean() < 6.0


class TestCtc:
    def test_greedy_decode(self):
        # T=6, V=4 (0=blank). sequence: blank a a blank b b -> "ab"
        t = np.full((1, 6, 4), -10.0, np.float32)
        for i, v in enumerate([0, 1, 1, 0, 2, 2]):
            t[0, i, v] = 10.0
        ids, mask, conf = ctc_greedy_decode(jnp.asarray(t))
        texts = ids_to_text(ids, mask, ["", "a", "b", "c"])
        assert texts == ["ab"]
        assert float(conf[0]) > 0.99

    def test_repeat_with_blank_between(self):
        t = np.full((1, 5, 3), -10.0, np.float32)
        for i, v in enumerate([1, 0, 1, 0, 1]):  # a blank a blank a -> "aaa"
            t[0, i, v] = 10.0
        ids, mask, conf = ctc_greedy_decode(jnp.asarray(t))
        assert ids_to_text(ids, mask, ["", "a", "b"]) == ["aaa"]


class TestNms:
    def test_hard_nms(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                         np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        kb, ks, idx = hard_nms(boxes, scores, iou_threshold=0.5)
        assert list(idx) == [0, 2]

    def test_score_threshold(self):
        boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
        scores = np.array([0.9, 0.05], np.float32)
        _, _, idx = hard_nms(boxes, scores, score_threshold=0.1)
        assert list(idx) == [0]

    def test_empty(self):
        kb, ks, idx = hard_nms(np.zeros((0, 4)), np.zeros((0,)))
        assert len(idx) == 0


class TestCenterNetDecode:
    def test_heatmap_nms_keeps_peak(self):
        h = np.zeros((1, 8, 8, 1), np.float32)
        h[0, 3, 3, 0] = 0.9
        h[0, 3, 4, 0] = 0.5  # neighbor suppressed
        out = np.asarray(heatmap_nms(jnp.asarray(h)))
        assert out[0, 3, 3, 0] == pytest.approx(0.9)
        assert out[0, 3, 4, 0] == 0.0

    def test_decode_boxes_4ps(self):
        B, H, W = 1, 16, 16
        heat = np.zeros((B, H, W, 2), np.float32)
        heat[0, 5, 7, 0] = 0.95  # one cell center at (x=7, y=5), class 0
        wh = np.zeros((B, H, W, 8), np.float32)
        # corners at center - offsets: offsets (x,y interleaved)
        wh[0, 5, 7] = [3, 2, -3, 2, -3, -2, 3, -2]  # tl,tr,br,bl
        reg = np.zeros((B, H, W, 2), np.float32)
        reg[0, 5, 7] = [0.25, 0.5]
        boxes, scores, clses, centers, inds = decode_boxes_4ps(
            jnp.asarray(heat), jnp.asarray(wh), jnp.asarray(reg), k=4)
        boxes, scores = np.asarray(boxes), np.asarray(scores)
        assert scores[0, 0] == pytest.approx(0.95)
        cx, cy = 7.25, 5.5
        np.testing.assert_allclose(
            boxes[0, 0],
            [cx - 3, cy - 2, cx + 3, cy - 2, cx + 3, cy + 2, cx - 3, cy + 2],
            atol=1e-5)


class TestDeformConv:
    def test_identity_kernel(self, rng):
        # zero offsets + ones mask + delta kernel = identity
        x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
        offset = np.zeros((1, 8, 8, 18), np.float32)
        mask = np.ones((1, 8, 8, 9), np.float32)
        weight = np.zeros((3, 3, 4, 4), np.float32)
        for c in range(4):
            weight[1, 1, c, c] = 1.0
        out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                       jnp.asarray(mask), jnp.asarray(weight)))
        np.testing.assert_allclose(out, x, atol=1e-5)

    def test_matches_numpy_reference(self, rng):
        x = rng.normal(size=(2, 6, 7, 3)).astype(np.float32)
        offset = (rng.normal(size=(2, 6, 7, 18)) * 0.7).astype(np.float32)
        mask = rng.uniform(0.2, 1.0, size=(2, 6, 7, 9)).astype(np.float32)
        weight = rng.normal(size=(3, 3, 3, 5)).astype(np.float32) * 0.2
        bias = rng.normal(size=(5,)).astype(np.float32)
        out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                       jnp.asarray(mask), jnp.asarray(weight),
                                       jnp.asarray(bias)))
        ref = deform_conv2d_reference_numpy(x, offset, mask, weight, bias)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_stride_2(self, rng):
        x = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
        offset = np.zeros((1, 4, 4, 18), np.float32)
        mask = np.ones((1, 4, 4, 9), np.float32)
        weight = rng.normal(size=(3, 3, 2, 3)).astype(np.float32)
        out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                       jnp.asarray(mask), jnp.asarray(weight),
                                       stride=(2, 2)))
        ref = deform_conv2d_reference_numpy(x, offset, mask, weight,
                                            stride=(2, 2))
        assert out.shape == (1, 4, 4, 3)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_gradients_flow(self, rng):
        import jax
        x = jnp.asarray(rng.normal(size=(1, 5, 5, 2)).astype(np.float32))
        offset = jnp.asarray((rng.normal(size=(1, 5, 5, 18)) * 0.3).astype(np.float32))
        mask = jnp.ones((1, 5, 5, 9), jnp.float32) * 0.5
        weight = jnp.asarray(rng.normal(size=(3, 3, 2, 2)).astype(np.float32))

        def loss(w, off):
            return jnp.sum(deform_conv2d(x, off, mask, w) ** 2)

        gw, goff = jax.grad(loss, argnums=(0, 1))(weight, offset)
        assert np.isfinite(np.asarray(gw)).all()
        assert np.isfinite(np.asarray(goff)).all()
        assert np.abs(np.asarray(goff)).max() > 0


class TestConnectedComponents:
    def test_two_blobs(self):
        m = np.zeros((16, 16), bool)
        m[2:5, 2:6] = True
        m[10:14, 8:12] = True
        labels = np.asarray(connected_components(jnp.asarray(m)))
        l1 = labels[3, 3]
        l2 = labels[11, 9]
        assert l1 > 0 and l2 > 0 and l1 != l2
        assert (labels[2:5, 2:6] == l1).all()
        assert (labels[10:14, 8:12] == l2).all()
        assert labels[0, 0] == 0

    def test_diagonal_connectivity(self):
        m = np.zeros((8, 8), bool)
        m[1, 1] = True
        m[2, 2] = True  # 8-connected
        labels = np.asarray(connected_components(jnp.asarray(m)))
        assert labels[1, 1] == labels[2, 2] > 0

    def test_component_boxes(self):
        m = np.zeros((16, 16), bool)
        m[2:5, 2:6] = True
        m[10:14, 8:12] = True
        scores = np.full((16, 16), 0.8, np.float32)
        labels = connected_components(jnp.asarray(m))
        boxes, means, areas, valid = component_boxes(labels, jnp.asarray(scores), 8)
        boxes = np.asarray(boxes)[np.asarray(valid)]
        assert len(boxes) == 2
        box_set = {tuple(b) for b in boxes.astype(int).tolist()}
        assert (2, 2, 6, 5) in box_set
        assert (8, 10, 12, 14) in box_set
        means = np.asarray(means)[np.asarray(valid)]
        np.testing.assert_allclose(means, 0.8, atol=1e-5)

    def test_matches_cv2(self, rng):
        m = (rng.uniform(size=(32, 32)) > 0.7)
        labels = np.asarray(connected_components(jnp.asarray(m)))
        n_ref, ref_labels = cv2.connectedComponents(
            m.astype(np.uint8), connectivity=8)
        # same number of components
        assert len(np.unique(labels[labels > 0])) == n_ref - 1


class TestVariableCrops:
    def test_axis_aligned_slices(self):
        import numpy as np

        from pdf_table_tpu.ops.warp import crop_rotated_boxes

        img = np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3)
        quads = np.array([[10, 5, 30, 5, 30, 15, 10, 15]], np.float32)
        crops = crop_rotated_boxes(img, quads, None)
        assert len(crops) == 1
        assert crops[0].shape == (10, 20, 3)
        assert np.array_equal(crops[0], img[5:15, 10:30])

    def test_rotated_warps(self):
        import numpy as np

        from pdf_table_tpu.ops.warp import crop_rotated_boxes

        img = np.zeros((50, 50, 3), np.uint8)
        img[20:30, 10:40] = 200
        # slightly rotated quad around the bar
        quads = np.array([[10, 21, 39, 19, 40, 29, 11, 31]], np.float32)
        crops = crop_rotated_boxes(img, quads, None)
        assert len(crops) == 1
        assert crops[0].mean() > 100  # captured the bright bar

    def test_empty(self):
        from pdf_table_tpu.ops.warp import crop_rotated_boxes
        import numpy as np

        assert crop_rotated_boxes(np.zeros((10, 10, 3), np.uint8),
                                  np.zeros((0, 4, 2)), None) == []


class TestWarpFromPages:
    def test_matches_single_page_warp(self):
        import jax.numpy as jnp

        from pdf_table_tpu.ops.warp import (perspective_matrices,
                                            warp_crops_from_pages,
                                            warp_perspective_batch)

        rng = np.random.default_rng(0)
        pages = rng.integers(0, 255, (2, 40, 50, 3)).astype(np.uint8)
        quads = np.array([[[5, 5], [30, 6], [29, 18], [4, 17]],
                          [[10, 10], [45, 12], [44, 30], [9, 28]]],
                         np.float32)
        out_hw = (16, 48)
        mats = perspective_matrices(quads, out_hw)
        ref0 = np.asarray(warp_perspective_batch(
            jnp.asarray(pages[0]), jnp.asarray(mats[:1]), out_hw))[0]
        ref1 = np.asarray(warp_perspective_batch(
            jnp.asarray(pages[1]), jnp.asarray(mats[1:]), out_hw))[0]
        out = np.asarray(warp_crops_from_pages(
            jnp.asarray(pages), jnp.asarray([0, 1], np.int32),
            jnp.asarray(mats), jnp.asarray([48, 48], np.int32), out_hw))
        assert np.allclose(out[0], ref0, atol=1e-3)
        assert np.allclose(out[1], ref1, atol=1e-3)

    def test_width_mask_zeroes_padding(self):
        import jax.numpy as jnp

        from pdf_table_tpu.ops.warp import (perspective_matrices,
                                            warp_crops_from_pages)

        pages = np.full((1, 30, 30, 3), 200, np.uint8)
        quads = np.array([[[2, 2], [20, 2], [20, 12], [2, 12]]], np.float32)
        out_hw = (10, 32)
        mats = perspective_matrices(quads, (10, 16))
        out = np.asarray(warp_crops_from_pages(
            jnp.asarray(pages), jnp.asarray([0], np.int32),
            jnp.asarray(mats), jnp.asarray([16], np.int32), out_hw))
        assert out[0, :, :16].mean() > 100        # sampled content
        assert np.all(out[0, :, 16:] == 0)        # masked padding


class TestFastConnectedComponents:
    """Segmented-scan CC (r4 perf: run-min scans replaced the
    gather-bound pointer jumps — 124 -> 25 ms per 8-page chunk on v5e;
    fixed-iteration, compile-friendly, for the batched det-box path)."""

    def _fast(self):
        import importlib
        return importlib.import_module(
            "pdf_table_tpu.ops.connected_components")

    def test_matches_scipy_on_text_shapes(self):
        import numpy as np
        import jax.numpy as jnp
        from scipy import ndimage

        cc = self._fast()
        m = np.zeros((64, 320), bool)
        m[10:18, 20:300] = True          # long text line
        m[30:34, 40:80] = True           # word
        m[40:60, 100:104] = True         # vertical rule
        # rectangle outline (table border)
        m[50:52, 150:310] = True
        m[60:62, 150:310] = True
        m[50:62, 150:152] = True
        m[50:62, 308:310] = True
        gt, n = ndimage.label(m, structure=np.ones((3, 3)))
        b = np.asarray(cc.connected_components_scan(jnp.asarray(m),
                                                    num_iters=8))
        for lab in range(1, n + 1):
            assert len(np.unique(b[gt == lab])) == 1
        reps = [int(np.unique(b[gt == lab])[0]) for lab in range(1, n + 1)]
        assert len(set(reps)) == n
        assert (b[~m] == 0).all()

    def test_long_component_beyond_old_cap(self):
        """The while_loop variant silently truncated components longer
        than its old 256-iteration cap; both variants must label a 360-px
        line as ONE component now."""
        import numpy as np
        import jax.numpy as jnp

        cc = self._fast()
        m = np.zeros((8, 360), bool)
        m[4, :] = True
        a = np.asarray(cc.connected_components(jnp.asarray(m)))
        b = np.asarray(cc.connected_components_scan(jnp.asarray(m),
                                                    num_iters=8))
        assert len(np.unique(a[m])) == 1
        assert (a == b).all()

    def test_adversarial_blobs_converge_at_12(self):
        """Dilated random noise (snaky components, worst case measured)
        fully converges by 12 rounds; the det-box path runs 8 (text/table
        shapes need 2-3, and the failure mode is a split box, not a
        missed one)."""
        import numpy as np
        import jax.numpy as jnp
        from scipy import ndimage

        cc = self._fast()
        rng = np.random.default_rng(1)
        m = ndimage.binary_dilation(rng.random((120, 160)) > 0.97,
                                    iterations=2)
        gt, n = ndimage.label(m, structure=np.ones((3, 3)))
        b = np.asarray(cc.connected_components_scan(jnp.asarray(m),
                                                    num_iters=12))
        for lab in range(1, n + 1):
            assert len(np.unique(b[gt == lab])) == 1
        reps = [int(np.unique(b[gt == lab])[0]) for lab in range(1, n + 1)]
        assert len(set(reps)) == n

    def test_batched_boxes_respect_valid_extent(self):
        import numpy as np
        import jax.numpy as jnp

        from pdf_table_tpu.ops import batch_component_boxes_u8

        p = np.zeros((1, 40, 60), np.uint8)
        p[0, 5:10, 5:20] = 200       # inside valid region
        p[0, 30:38, 40:58] = 220     # OUTSIDE valid extent -> padding
        out = np.asarray(batch_component_boxes_u8(
            jnp.asarray(p), 100, jnp.asarray([[20, 30]], np.int32), 8))
        rows = out[0][out[0][:, 5] > 0]
        assert len(rows) == 1
        # half-res labeling: boxes come back within 2 px of exact
        import numpy as np
        np.testing.assert_allclose(rows[0][:4], [5.0, 5.0, 20.0, 10.0],
                                   atol=2.0)


class TestBatchedWarpHelpers:
    def test_order_points_batch_matches_scalar(self):
        import numpy as np

        from pdf_table_tpu.ops.warp import (order_points_clockwise,
                                            order_points_clockwise_batch)

        rng = np.random.default_rng(3)
        quads = rng.uniform(0, 100, (20, 4, 2)).astype(np.float32)
        got = order_points_clockwise_batch(quads)
        for q, g in zip(quads, got):
            np.testing.assert_allclose(g, order_points_clockwise(q))

    def test_homography_batch_matches_scalar(self):
        import numpy as np

        from pdf_table_tpu.ops.warp import (_homography_from_quad,
                                            homographies_from_quads_batch,
                                            order_points_clockwise_batch)

        rng = np.random.default_rng(4)
        base = np.array([[10, 10], [80, 12], [82, 40], [8, 38]], np.float32)
        quads = order_points_clockwise_batch(
            base[None] + rng.normal(0, 3, (12, 4, 2)).astype(np.float32))
        ws = rng.integers(20, 200, 12)
        got = homographies_from_quads_batch(quads, ws, 48.0)
        for q, w, g in zip(quads, ws, got):
            np.testing.assert_allclose(
                g, _homography_from_quad(q, float(w), 48.0), atol=1e-4)
