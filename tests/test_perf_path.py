"""Pallas kernels (interpret mode) + batched pipeline tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestResizeNormKernel:
    def test_pallas_matches_xla(self):
        from pdf_table_tpu.ops.pallas.resize_norm import (
            resize_normalize_pallas, resize_normalize_xla)

        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(0, 255, (2, 40, 56, 3))
                           .astype(np.float32))
        mean = jnp.array([123.68, 116.78, 103.94])
        std = jnp.array([255.0, 255.0, 255.0])
        ref = resize_normalize_xla(imgs, (32, 64), mean, std)
        out = resize_normalize_pallas(imgs, (32, 64), mean, std,
                                      interpret=True)
        # bf16 operands inside the kernel -> small quantization error
        assert float(jnp.abs(ref - out).max()) < 3e-2

    def test_resize_matrix_partition_of_unity(self):
        from pdf_table_tpu.ops.pallas.resize_norm import _resize_matrix

        w = _resize_matrix(32, 100)
        assert np.allclose(w.sum(axis=1), 1.0, atol=1e-6)


class TestBatchPipeline:
    def test_pack_pages_buckets(self):
        from pdf_table_tpu.pipeline.batch_runner import pack_pages

        imgs = [np.zeros((500, 400, 3), np.uint8),
                np.zeros((1300, 1000, 3), np.uint8)]
        groups = pack_pages(imgs)
        assert (1280, 960) in groups and (1600, 1280) in groups
        g = groups[(1280, 960)]
        assert g["images"].shape == (1, 1280, 960, 3)
        assert g["shapes"] == [(500, 400)]

    def test_batched_raster_pages(self):
        from pdf_table_tpu.pipeline.batch_runner import BatchPipeline
        from pdf_table_tpu.pipeline.system import OcrSystemConfig
        from pdf_table_tpu.tasks.detection import OcrDetectionTask
        from pdf_table_tpu.tasks.recognition import OcrRecognitionTask
        from pdf_table_tpu.models.rec_ctc import RecConfig

        cfg = OcrSystemConfig(use_layout=False, use_table=False,
                              use_orientation_cls=False,
                              use_textline_cls=False)
        bp = BatchPipeline(cfg)
        # inject tiny models
        bp.system._det = OcrDetectionTask(model="PP-OCRv4_det",
                                          inner_channels=48,
                                          limit_side_len=96)
        bp.system._rec = OcrRecognitionTask(
            config=RecConfig(width_buckets=(80,)))

        img = np.full((120, 100, 3), 255, np.uint8)
        img[30:42, 10:90] = 30
        pages = [{"image": img}, {"image": img.copy()}]
        results = bp.run(pages)
        assert len(results) == 2
        for r in results:
            assert r.page_html is not None

    def test_two_canvas_buckets_one_run(self):
        """Pages spanning two canvas buckets in ONE run(): chunk grouping,
        per-bucket det programs and result re-ordering all hold."""
        from pdf_table_tpu.models.rec_ctc import RecConfig
        from pdf_table_tpu.pipeline.batch_runner import BatchPipeline
        from pdf_table_tpu.pipeline.system import OcrSystemConfig
        from pdf_table_tpu.tasks.detection import OcrDetectionTask
        from pdf_table_tpu.tasks.recognition import OcrRecognitionTask

        cfg = OcrSystemConfig(use_layout=False, use_table=False,
                              use_orientation_cls=False,
                              use_textline_cls=False)
        bp = BatchPipeline(cfg)
        bp.system._det = OcrDetectionTask(model="PP-OCRv4_det",
                                          inner_channels=48,
                                          limit_side_len=96)
        bp.system._rec = OcrRecognitionTask(
            config=RecConfig(width_buckets=(80,)))

        small = np.full((120, 100, 3), 255, np.uint8)
        small[30:42, 10:90] = 30
        big = np.full((1300, 1000, 3), 255, np.uint8)
        big[100:130, 100:900] = 30
        pages = [{"image": small}, {"image": big},
                 {"image": small.copy()}]
        results = bp.run(pages)
        assert len(results) == 3
        # outputs keep input order and carry each page's own geometry
        assert results[0].image_shape == (120, 100)
        assert results[1].image_shape == (1300, 1000)
        assert results[2].image_shape == (120, 100)
        for r in results:
            assert r.page_html is not None

    def test_mixed_digital_and_raster(self, tmp_path):
        from pdf_table_tpu.pdfio.reader import PdfDocument
        from pdf_table_tpu.pdfio.writer import PdfWriter
        from pdf_table_tpu.pipeline.batch_runner import BatchPipeline
        from pdf_table_tpu.pipeline.system import OcrSystemConfig
        from pdf_table_tpu.tasks.detection import OcrDetectionTask
        from pdf_table_tpu.tasks.recognition import OcrRecognitionTask
        from pdf_table_tpu.models.rec_ctc import RecConfig

        w = PdfWriter()
        page = w.add_page(200, 150)
        page.text(20, 120, "Digital text", size=12)
        p = str(tmp_path / "d.pdf")
        w.save(p)

        cfg = OcrSystemConfig(use_layout=False, use_table=False,
                              use_orientation_cls=False,
                              use_textline_cls=False, render_dpi=72)
        bp = BatchPipeline(cfg)
        bp.system._det = OcrDetectionTask(model="PP-OCRv4_det",
                                          inner_channels=48,
                                          limit_side_len=96)
        bp.system._rec = OcrRecognitionTask(
            config=RecConfig(width_buckets=(80,)))

        with PdfDocument.open(p) as doc:
            pdf_page = doc.load_page(0)
            raster = np.full((100, 100, 3), 255, np.uint8)
            results = bp.run([{"pdf_page": pdf_page, "pdf_doc": doc},
                              {"image": raster}])
        assert len(results) == 2
        assert "Digital text" in results[0].page_html


class TestBatchPipelineFullStages:
    """Full BASELINE metric path: batched det + batched layout + pooled TSR
    + rec + table/page HTML in one run() (VERDICT round-1 item 3)."""

    def _pipeline(self):
        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.models.rec_ctc import RecConfig
        from pdf_table_tpu.pipeline.batch_runner import BatchPipeline
        from pdf_table_tpu.pipeline.system import OcrSystemConfig
        from pdf_table_tpu.tasks.detection import OcrDetectionTask
        from pdf_table_tpu.tasks.layout import OcrLayoutTask
        from pdf_table_tpu.tasks.recognition import OcrRecognitionTask
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        cfg = OcrSystemConfig(use_layout=True, use_table=True,
                              use_orientation_cls=False,
                              use_textline_cls=False)
        bp = BatchPipeline(cfg, batch_pages=2)
        bp.system._det = OcrDetectionTask(model="PP-OCRv4_det",
                                          inner_channels=48,
                                          limit_side_len=96)
        bp.system._rec = OcrRecognitionTask(
            config=RecConfig(width_buckets=(80,)))
        # single-class "table" picodet with a floor threshold: random
        # weights still emit table regions, exercising the TSR pool
        bp.system._layout = OcrLayoutTask(
            model="picodet", task_type="table", img_height=64, img_width=64,
            neck_channels=32, head_convs=1, score_threshold=0.01,
            keep_top_k=1)
        bp.system._tsr = OcrTableStructureTask(
            model="Lore", config=LoreConfig(
                backbone="resnet18", resolution=(64, 64), max_objs=4,
                max_corners=8, hidden_size=32, tsfm_layers=1,
                stacking_layers=1, num_heads=2, d_ff=32, head_conv=16,
                vis_thresh=0.0))
        return bp

    def test_layout_and_tsr_in_batch_path(self):
        from pdf_table_tpu.pipeline.batch_runner import BatchPipeline

        bp = self._pipeline()
        img = np.full((120, 100, 3), 255, np.uint8)
        img[30:42, 10:90] = 30
        pages = [{"image": img.copy()} for _ in range(3)]
        results = bp.run(pages)
        assert len(results) == 3
        for r in results:
            assert r.page_html is not None
            assert r.layout_cells, "batched layout must populate cells"
        # at least one page sends a table crop through the pooled TSR
        assert any(r.table_structures for r in results)

    def test_layout_batch_matches_per_page(self):
        """batch_infer == per-image __call__ for the layout task."""
        bp = self._pipeline()
        task = bp.system.layout_task
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (100, 80, 3), np.uint8)
                for _ in range(3)]
        batched = task.batch_infer(imgs)
        for img, cells in zip(imgs, batched):
            solo = task(img)["layout_cells"]
            assert len(solo) == len(cells)
            for a, b in zip(solo, cells):
                assert np.allclose(a.bbox, b.bbox, atol=1e-3)
                assert abs(a.score - b.score) < 1e-4


class TestMeshBatchDetection:
    def test_dp_sharded_det(self, cpu_mesh):
        from pdf_table_tpu.models.rec_ctc import RecConfig
        from pdf_table_tpu.pipeline.batch_runner import BatchPipeline
        from pdf_table_tpu.pipeline.system import OcrSystemConfig
        from pdf_table_tpu.tasks.detection import OcrDetectionTask
        from pdf_table_tpu.tasks.recognition import OcrRecognitionTask

        cfg = OcrSystemConfig(use_layout=False, use_table=False,
                              use_orientation_cls=False,
                              use_textline_cls=False)
        bp = BatchPipeline(cfg, mesh=cpu_mesh, batch_pages=8)
        bp.system._det = OcrDetectionTask(model="PP-OCRv4_det",
                                          inner_channels=48,
                                          limit_side_len=96)
        bp.system._rec = OcrRecognitionTask(
            config=RecConfig(width_buckets=(80,)))

        img = np.full((120, 100, 3), 255, np.uint8)
        img[30:42, 10:90] = 30
        # 5 pages -> padded to 8 for the dp=8 mesh
        pages = [{"image": img.copy()} for _ in range(5)]
        results = bp.run(pages)
        assert len(results) == 5
        for r in results:
            assert r.page_html is not None


class TestMeshRecSweep:
    def test_dp_sharded_batched_rec(self, cpu_mesh):
        """The pooled recognition sweep runs with a dp mesh attached
        (params replicate; crop batches flow through the bucketed
        programs)."""
        import numpy as np

        from pdf_table_tpu.models.rec_ctc import RecConfig
        from pdf_table_tpu.tasks.recognition import OcrRecognitionTask

        rec = OcrRecognitionTask(config=RecConfig(width_buckets=(80,)),
                                 mesh=cpu_mesh)
        rng = np.random.default_rng(0)
        crops = [rng.integers(0, 255, (20, 60 + 5 * i, 3), np.uint8)
                 for i in range(5)]
        out = rec(crops)
        assert len(out["texts"]) == 5
        assert len(out["scores"]) == 5


class TestMeshTpTrainAxis:
    def test_dp_tp_train_step_shards_wide_kernels(self):
        """dp x tp mesh: wide kernels shard over tp, the step runs, and the
        sharded parameters really live distributed (the axis the round-1
        driver dryrun exercised, kept as an in-suite regression)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax
        from jax.sharding import Mesh

        from pdf_table_tpu.train.train_step import (TrainState,
                                                    make_param_shardings,
                                                    make_train_step,
                                                    shard_state)

        devices = np.array(jax.devices("cpu")[:8]).reshape(4, 2)
        mesh = Mesh(devices, axis_names=("dp", "tp"))

        import flax.linen as nn

        class Toy(nn.Module):
            @nn.compact
            def __call__(self, x, train=True):
                h = nn.Dense(512, name="wide")(x)   # sharded over tp
                h = jax.nn.relu(h)
                return nn.Dense(4, name="head")(h)

        model = Toy()
        x0 = np.zeros((8, 16), np.float32)
        variables = model.init(jax.random.PRNGKey(0), x0)
        tx = optax.sgd(0.1)
        state = TrainState.create(variables, tx)

        shardings = make_param_shardings(mesh, state.params,
                                         min_shard_dim=256)
        wide_spec = shardings["wide"]["kernel"].spec
        assert "tp" in str(wide_spec), wide_spec

        with mesh:
            state = shard_state(state, mesh, min_shard_dim=256)

            def apply_fn(vars_, batch):
                return model.apply(vars_, batch["x"]), {}

            def loss_fn(outputs, batch):
                return {"loss": jnp.mean((outputs - batch["y"]) ** 2)}

            step = make_train_step(apply_fn, loss_fn, tx, mesh=mesh,
                                   donate=False)
            batch = {"x": np.ones((8, 16), np.float32),
                     "y": np.zeros((8, 4), np.float32)}
            state2, metrics = step(state, batch)
            assert np.isfinite(float(metrics["loss"]))
            # the wide kernel's value is sharded across devices
            k = state2.params["wide"]["kernel"]
            assert len(k.sharding.device_set) > 1


class TestDeviceFlipEquivalence:
    def test_flip_realignment_matches_flipped_warp(self):
        """The fused rec program replaces the second canvas warp with a
        double-reverse + realignment gather; both must produce the same
        180-rotated, left-aligned crop."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pdf_table_tpu.ops.warp import (_homography_from_quad,
                                            order_points_clockwise,
                                            warp_crops_from_pages)

        rng = np.random.default_rng(0)
        page = rng.integers(0, 255, (1, 64, 96, 3)).astype(np.uint8)
        quad = order_points_clockwise(
            np.array([[10, 10], [70, 12], [69, 30], [9, 28]], np.float32))
        oh, bucket = 16, 48
        w = 40
        mat = _homography_from_quad(quad, w, oh)
        fmat = _homography_from_quad(np.roll(quad, 2, axis=0), w, oh)
        pages = jnp.asarray(page)
        pidx = jnp.zeros((1,), jnp.int32)
        widths = jnp.asarray([w], jnp.int32)

        crops = warp_crops_from_pages(pages, pidx, jnp.asarray(mat[None]),
                                      widths, (oh, bucket))
        want = np.asarray(warp_crops_from_pages(
            pages, pidx, jnp.asarray(fmat[None]), widths, (oh, bucket)))

        rev = crops[:, ::-1, ::-1, :]
        jj = jnp.arange(bucket)[None, :]
        src = jnp.clip(jj + (bucket - widths)[:, None], 0, bucket - 1)
        flipped = jnp.take_along_axis(rev, src[:, None, :, None], axis=2)
        flipped = jnp.where(jj[:, None, :, None] < widths[:, None, None,
                                                          None],
                            flipped, 0.0)
        got = np.asarray(flipped)
        # identical inside the content region (tiny fp differences from
        # sampling the same homography from the two directions)
        np.testing.assert_allclose(got[0, :, :w], want[0, :, :w], atol=1.5)
        # padding region zeroed
        assert np.all(got[0, :, w:] == 0)

    def test_also_flipped_matches_take_along_axis_realign(self):
        """The axis-aligned fused rec path gets its 180 candidate from
        resample_axis_aligned_crops(also_flipped=True) — it must equal
        the double-reverse + realignment gather of the forward crop."""
        import jax.numpy as jnp
        import numpy as np

        from pdf_table_tpu.ops.warp import resample_axis_aligned_crops

        rng = np.random.default_rng(1)
        pages = jnp.asarray(
            rng.integers(0, 255, (2, 64, 96, 3)).astype(np.uint8))
        boxes = jnp.asarray([[8.0, 10.0, 72.0, 26.0],
                             [3.5, 40.0, 90.0, 55.0],
                             [0.0, 0.0, 96.0, 64.0]], jnp.float32)
        pidx = jnp.asarray([0, 1, 0], jnp.int32)
        oh, bucket = 16, 64
        widths = jnp.asarray([40, 64, 24], jnp.int32)

        crops, flipped = resample_axis_aligned_crops(
            pages, pidx, boxes, (oh, bucket),
            dst_w=widths.astype(jnp.float32), valid_w=widths,
            also_flipped=True)

        rev = crops[:, ::-1, ::-1, :]
        jj = jnp.arange(bucket)[None, :]
        src = jnp.clip(jj + (bucket - widths)[:, None], 0, bucket - 1)
        want = jnp.take_along_axis(rev, src[:, None, :, None], axis=2)
        want = jnp.where(jj[:, None, :, None] < widths[:, None, None,
                                                       None],
                         want, 0.0)
        np.testing.assert_allclose(np.asarray(flipped), np.asarray(want),
                                   atol=1.0)
        # padding region zeroed
        for i, w in enumerate([40, 64, 24]):
            assert np.all(np.asarray(flipped)[i, :, w:] == 0)


class TestDeviceBoxParity:
    def test_device_boxes_match_host_fast_path(self):
        """Dual-path golden check (SURVEY §7 hard part 3): the device CC
        box path and the host cv2 CC path agree on box geometry for
        text-shaped prob maps."""
        import jax.numpy as jnp
        import numpy as np

        from pdf_table_tpu.pipeline.batch_runner import BatchPipeline
        from pdf_table_tpu.pipeline.system import OcrSystemConfig

        bp = BatchPipeline(OcrSystemConfig(use_layout=False,
                                           use_table=False,
                                           use_orientation_cls=False,
                                           use_textline_cls=False))
        det = bp.system.det_task
        cfg = det.model_config

        prob = np.zeros((1, 120, 100), np.float32)
        prob[0, 10:16, 10:60] = 0.9      # text line
        prob[0, 40:46, 20:80] = 0.8
        prob[0, 100:104, 5:25] = 0.85
        probs_u8 = (prob * 255).astype(np.uint8)

        host = bp._det_post(probs_u8, [(240, 200)], (240, 200),
                            (240, 200), fast_post=True)
        packed = np.asarray(bp._boxes_enqueue(
            jnp.asarray(probs_u8), [(240, 200)], (240, 200)))
        dev = bp._boxes_finish(packed, [(240, 200)], (240, 200),
                               (120, 100))
        assert len(host[0]) == len(dev[0]) == 3
        # order may differ (host sorts by area); match by nearest center
        hc = np.sort(host[0].reshape(-1, 4, 2).mean(axis=1), axis=0)
        dc = np.sort(dev[0].reshape(-1, 4, 2).mean(axis=1), axis=0)
        np.testing.assert_allclose(hc, dc, atol=6.0)


class TestPageCodec:
    """Tunnel upload codec (ops/page_codec.py): planar encode on host,
    RGB reconstruction on device."""

    def test_gray_roundtrip_exact(self):
        from pdf_table_tpu.ops.page_codec import (decode_pages_host,
                                                  encode_pages)

        rng = np.random.default_rng(0)
        g = rng.integers(0, 256, (2, 64, 96), np.uint8)
        pages = np.repeat(g[..., None], 3, axis=-1)
        planes, mode = encode_pages(pages, "auto")
        assert mode == "gray"
        assert planes["y"].nbytes * 3 == pages.nbytes
        np.testing.assert_array_equal(decode_pages_host(planes, mode),
                                      pages)

    def test_small_color_feature_survives_auto_gray(self):
        """ADVICE r3: a <16px color feature can evade page_is_gray's
        stride-16 grid; the auto-gray path must encode LUMA so the
        content stays visible (channel-0 slicing turned red-on-white
        into pure white and erased it from detection input)."""
        from pdf_table_tpu.ops.page_codec import (decode_pages_host,
                                                  encode_pages)

        pages = np.full((1, 64, 96, 3), 255, np.uint8)
        # pure red 6x6 stamp placed off the sampling grid
        pages[0, 17:23, 33:39] = (255, 0, 0)
        planes, mode = encode_pages(pages, "auto")
        assert mode == "gray"   # the grid misses it, by construction
        got = decode_pages_host(planes, mode)
        # BT.601 luma of pure red is ~76: clearly darker than the white
        # background, so detection still sees the stamp
        assert got[0, 20, 36, 0] < 100
        # the gray background stays exact
        np.testing.assert_array_equal(got[0, :10, :10], pages[0, :10, :10])

    def test_yuv420_roundtrip_close(self):
        from pdf_table_tpu.ops.page_codec import (decode_pages_host,
                                                  encode_pages,
                                                  encoded_nbytes)

        rng = np.random.default_rng(1)
        # smooth color page: block-constant color regions
        base = rng.integers(0, 256, (1, 8, 12, 3), np.uint8)
        pages = np.repeat(np.repeat(base, 8, axis=1), 8, axis=2)
        planes, mode = encode_pages(pages, "auto")
        assert mode == "yuv420"
        assert encoded_nbytes(planes) * 2 == pages.nbytes
        got = decode_pages_host(planes, mode).astype(np.int16)
        err = np.abs(got - pages.astype(np.int16))
        # luma-exact up to rounding; chroma within a few LSB on the
        # block interior (subsampling averages block edges)
        assert np.percentile(err, 95) <= 4

    def test_device_decode_matches_host(self):
        from pdf_table_tpu.ops.page_codec import (decode_pages_device,
                                                  decode_pages_host,
                                                  encode_pages)

        rng = np.random.default_rng(2)
        pages = rng.integers(0, 256, (2, 16, 24, 3), np.uint8)
        for mode_req in ("gray", "yuv420", "rgb"):
            planes, mode = encode_pages(pages, mode_req)
            dev = np.asarray(decode_pages_device(planes, mode))
            host = decode_pages_host(planes, mode)
            np.testing.assert_array_equal(dev, host)

    def test_rle_engages_at_chunk_volume_and_is_exact(self):
        """auto layers the lossless RLE transport over gray when the
        page is document-like (mostly white): exact roundtrip, >=4x
        smaller, device decode == host decode."""
        from pdf_table_tpu.ops.page_codec import (decode_pages_device,
                                                  decode_pages_host,
                                                  encode_pages,
                                                  encoded_nbytes)

        rng = np.random.default_rng(3)
        pages = np.full((2, 640, 512, 3), 255, np.uint8)
        for n in range(2):
            for y in range(40, 600, 36):
                x = 30
                for _ in range(int(rng.integers(2, 6))):
                    w = int(rng.integers(30, 90))
                    v = int(rng.integers(10, 80))
                    pages[n, y:y + 14, x:x + w] = v
                    x += w + 20
        planes, mode = encode_pages(pages, "auto")
        assert mode == "rle:gray"
        assert encoded_nbytes(planes) * 4 <= pages.nbytes // 3
        host = decode_pages_host(planes, mode)
        np.testing.assert_array_equal(host, pages)
        dev = np.asarray(decode_pages_device(planes, mode))
        np.testing.assert_array_equal(dev, pages)

    def test_rle_falls_back_on_incompressible_pages(self):
        """Noise pages produce ~as many runs as bytes: auto must keep
        the plain planar form instead of inflating the upload."""
        from pdf_table_tpu.ops.page_codec import encode_pages

        rng = np.random.default_rng(4)
        g = rng.integers(0, 256, (1, 512, 512), np.uint8)
        pages = np.repeat(g[..., None], 3, axis=-1)
        planes, mode = encode_pages(pages, "auto")
        assert mode == "gray"
        assert "rle_starts" not in planes

    def test_rle_color_pages_roundtrip(self):
        """RLE over yuv420: color block content compresses and decodes
        through the same scatter+cumsum path."""
        from pdf_table_tpu.ops.page_codec import (decode_pages_device,
                                                  decode_pages_host,
                                                  encode_pages)

        pages = np.full((1, 512, 512, 3), 255, np.uint8)
        pages[0, 100:300, 100:300] = (200, 40, 40)
        planes, mode = encode_pages(pages, "auto")
        assert mode == "rle:yuv420"
        host = decode_pages_host(planes, mode)
        dev = np.asarray(decode_pages_device(planes, mode))
        np.testing.assert_array_equal(dev, host)
        err = np.abs(host.astype(np.int16) - pages.astype(np.int16))
        assert np.percentile(err, 95) <= 4

    def test_batch_pipeline_gray_codec_matches_rgb(self):
        """End-to-end: a gray corpus through codec='auto' produces the
        same boxes/HTML as the rgb passthrough (gray encode is exact)."""
        from pdf_table_tpu.models.rec_ctc import RecConfig
        from pdf_table_tpu.pipeline.batch_runner import BatchPipeline
        from pdf_table_tpu.pipeline.system import OcrSystemConfig
        from pdf_table_tpu.tasks.detection import OcrDetectionTask
        from pdf_table_tpu.tasks.recognition import OcrRecognitionTask

        def build(codec):
            cfg = OcrSystemConfig(use_layout=False, use_table=False,
                                  use_orientation_cls=False,
                                  use_textline_cls=False)
            bp = BatchPipeline(cfg, upload_codec=codec)
            bp.system._det = OcrDetectionTask(model="PP-OCRv4_det",
                                              inner_channels=48,
                                              limit_side_len=96)
            bp.system._rec = OcrRecognitionTask(
                config=RecConfig(width_buckets=(80,)))
            return bp

        img = np.full((120, 100, 3), 255, np.uint8)
        img[30:42, 10:90] = 30
        pages = [{"image": img}, {"image": img.copy()}]
        r_rgb = build("rgb").run(pages)
        r_auto = build("auto").run(pages)
        assert len(r_rgb) == len(r_auto) == 2
        for a, b in zip(r_rgb, r_auto):
            assert len(a.text_cells) == len(b.text_cells)
            assert a.page_html == b.page_html


class TestAxisAlignedResample:
    """resample_axis_aligned_crops (row-gather + MXU matmul) must match
    the generic gather warp on axis-aligned quads."""

    def _pages(self, rng, P=2, H=96, W=128):
        return rng.integers(0, 256, (P, H, W, 3), np.uint8)

    def test_matches_generic_warp_rec_semantics(self):
        import jax.numpy as jnp

        from pdf_table_tpu.ops.warp import (homographies_from_quads_batch,
                                            resample_axis_aligned_crops,
                                            warp_crops_from_pages)

        rng = np.random.default_rng(0)
        pages = self._pages(rng)
        N, oh, ow = 6, 16, 48
        x1 = rng.uniform(0, 60, N); y1 = rng.uniform(0, 50, N)
        w = rng.uniform(8, 60, N); h = rng.uniform(6, 30, N)
        x2, y2 = x1 + w, y1 + h
        quads = np.stack([np.stack([x1, y1], 1), np.stack([x2, y1], 1),
                          np.stack([x2, y2], 1), np.stack([x1, y2], 1)], 1)
        nws = np.clip(np.round(w * oh / h), 1, ow).astype(np.int32)
        pidx = rng.integers(0, pages.shape[0], N).astype(np.int32)
        mats = homographies_from_quads_batch(quads, nws, oh)
        want = np.asarray(warp_crops_from_pages(
            jnp.asarray(pages), jnp.asarray(pidx), jnp.asarray(mats),
            jnp.asarray(nws), (oh, ow)))
        boxes = np.stack([x1, y1, x2, y2], 1).astype(np.float32)
        got = np.asarray(resample_axis_aligned_crops(
            jnp.asarray(pages), jnp.asarray(pidx), jnp.asarray(boxes),
            (oh, ow), dst_w=jnp.asarray(nws.astype(np.float32)),
            valid_w=jnp.asarray(nws)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2.0)

    def test_matches_generic_warp_partial_extents_and_oob(self):
        """TSR semantics: full-square dst scale, partial valid_w/valid_h,
        boxes poking out of the page."""
        import jax.numpy as jnp

        from pdf_table_tpu.ops.warp import (homographies_from_quads_batch,
                                            resample_axis_aligned_crops,
                                            warp_crops_from_pages)

        rng = np.random.default_rng(1)
        pages = self._pages(rng)
        oh = ow = 32
        # one box partially outside the page (negative origin), one inside
        boxes = np.array([[-10, -8, 54, 56],
                          [30, 20, 94, 84]], np.float32)
        vw = np.array([20, 28], np.int32)
        vh = np.array([24, 32], np.int32)
        pidx = np.array([0, 1], np.int32)
        quads = np.stack([boxes[:, [0, 1]], boxes[:, [2, 1]],
                          boxes[:, [2, 3]], boxes[:, [0, 3]]], 1)
        mats = homographies_from_quads_batch(quads, float(ow), float(oh))
        want = np.asarray(warp_crops_from_pages(
            jnp.asarray(pages), jnp.asarray(pidx), jnp.asarray(mats),
            jnp.asarray(vw), (oh, ow), heights=jnp.asarray(vh)))
        got = np.asarray(resample_axis_aligned_crops(
            jnp.asarray(pages), jnp.asarray(pidx), jnp.asarray(boxes),
            (oh, ow), valid_w=jnp.asarray(vw), valid_h=jnp.asarray(vh)))
        np.testing.assert_allclose(got, want, atol=2.0)

    def test_quads_axis_aligned_mask(self):
        from pdf_table_tpu.ops.warp import quads_axis_aligned

        aa = np.array([[[10, 10], [50, 10], [50, 20], [10, 20]]],
                      np.float32)
        rot = np.array([[[10, 10], [50, 14], [48, 24], [8, 20]]],
                       np.float32)
        m = quads_axis_aligned(np.concatenate([aa, rot]))
        assert m.tolist() == [True, False]


class TestConvNextFusedDeviceRec:
    """ConvNextViT rides the fused device rec path (VERDICT r3 #7): the
    3x300px overlap chunking runs as slices of the device-warped 804
    canvas, chunk CTC logits time-concat on device, and the decode must
    match the host cv2 path."""

    def _pipeline(self):
        from pdf_table_tpu.models.rec_ctc.config import RecConfig
        from pdf_table_tpu.pipeline.batch_runner import BatchPipeline
        from pdf_table_tpu.pipeline.system import OcrSystemConfig
        from pdf_table_tpu.tasks.recognition import OcrRecognitionTask

        cfg = OcrSystemConfig(use_layout=False, use_table=False,
                              use_orientation_cls=False,
                              use_textline_cls=False)
        bp = BatchPipeline(cfg, batch_pages=2)
        rc = RecConfig.convnext_vit(
            vocab_size=8, convnext_depths=(1, 1, 1, 1),
            convnext_hidden=(8, 8, 16, 16), vit_dim=32, vit_layers=1,
            vit_heads=2)
        bp.system._rec = OcrRecognitionTask(model="ConvNextViT", config=rc)
        bp.device_crops = True
        return bp

    def test_chunk_construction_matches_host(self):
        """Pixel parity of the fused program's warp->gray->3x300 slicing
        vs the host cv2 chunked_convnext at native scale (argmax decode
        comparison is meaningless on random weights: interpolation noise
        flips near-tie argmaxes)."""
        import jax.numpy as jnp

        from pdf_table_tpu.ops.warp import resample_axis_aligned_crops

        rng = np.random.default_rng(3)
        page = np.full((200, 320, 3), 255, np.uint8)
        # strip exactly 32 px tall => the device resample and the host
        # cv2.resize are both identity copies of the crop
        page[40:72, 30:250] = rng.integers(0, 250, (32, 220, 3))
        bp = self._pipeline()
        rec = bp.system.rec_task
        cfg = rec.model_config
        cw, ov = cfg.chunk_width, cfg.chunk_overlap
        full_w = 3 * cw - 2 * ov

        # host: crop + chunk via the processor
        crop = page[40:72, 30:250]
        host = rec.pre.chunked_convnext([crop])["groups"][0]["images"]

        # device: the fused program's pre-model steps
        boxes = jnp.asarray([[30.0, 40.0, 250.0, 72.0]], jnp.float32)
        widths = jnp.asarray([220], jnp.int32)
        crops = resample_axis_aligned_crops(
            jnp.asarray(page[None]), jnp.zeros((1,), jnp.int32), boxes,
            (32, full_w), dst_w=widths.astype(jnp.float32),
            valid_w=widths)
        y = (0.299 * crops[..., 0] + 0.587 * crops[..., 1]
             + 0.114 * crops[..., 2])
        dev = np.stack([np.asarray(y[:, :, s0:s0 + cw])
                        for s0 in (0, cw - ov, 2 * (cw - ov))],
                       axis=1).reshape(-1, 32, cw)[..., None]
        assert dev.shape == host.shape
        # cv2 gray rounds to uint8; the device luma stays float
        np.testing.assert_allclose(dev, host.astype(np.float32), atol=1.5)

    def test_device_decode_flows(self):
        """The fused device path must produce one text per quad through
        rec_packed (time-concat + CTC on device)."""
        rng = np.random.default_rng(3)
        page = np.full((200, 320, 3), 255, np.uint8)
        page[40:58, 30:250] = rng.integers(0, 120, (18, 220, 3))
        quads = [np.array([[[30, 40], [250, 40], [250, 58], [30, 58]],
                           [[50, 90], [170, 90], [170, 108], [50, 108]]],
                          np.float32)]
        bp = self._pipeline()
        t_dev, s_dev = bp._recognize_all_device(page[None], quads)
        assert len(t_dev[0]) == 2 and len(s_dev[0]) == 2
        assert all(isinstance(t, str) for t in t_dev[0])

    def test_routed_through_batch_run(self):
        bp = self._pipeline()
        # junk det weights find few boxes; inject one known quad via the
        # det post hook like bench does
        quad = np.array([[[20, 30], [200, 30], [200, 48], [20, 48]]],
                        np.float32)
        bp._det_post = lambda *a, **k: [quad.copy()]
        bp._boxes_finish = lambda *a, **k: [quad.copy()]
        page = np.full((240, 260, 3), 255, np.uint8)
        page[30:48, 20:200] = 30
        res = bp.run([{"image": page}])
        assert len(res) == 1 and len(res[0].text_cells) == 1
