"""Model-zoo unit tests: shape/flow checks on tiny inputs (CPU).

Mirrors the reference's per-model smoke scripts (SURVEY.md §4) but hermetic:
random weights, synthetic images, assertions on shapes and decode structure.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def make_image(h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 255, np.uint8)
    # a dark text-like bar
    img[30:42, 20:100] = 30
    img[60:72, 20:80] = 30
    return img


class TestDBNet:
    @pytest.mark.parametrize("backbone,inner", [("resnet18", 64),
                                                ("mobilenetv3", 48)])
    def test_forward_shapes(self, backbone, inner):
        from pdf_table_tpu.models.dbnet import DBNet, DbNetConfig

        cfg = DbNetConfig(backbone=backbone, inner_channels=inner)
        model = DBNet(cfg)
        x = jnp.zeros((1, 64, 96, 3), jnp.float32)
        from pdf_table_tpu.engine.params import init_params
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        assert out["prob"].shape == (1, 64, 96)
        assert out["prob"].dtype == jnp.float32

    def test_train_mode_emits_thresh_binary(self):
        from pdf_table_tpu.models.dbnet import DBNet, DbNetConfig

        cfg = DbNetConfig(backbone="resnet18", inner_channels=64)
        model = DBNet(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        from pdf_table_tpu.engine.params import init_params
        variables = init_params(model, x, train=True)
        out, _ = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        assert set(out) == {"prob", "thresh", "binary"}
        assert np.all((np.asarray(out["binary"]) >= 0)
                      & (np.asarray(out["binary"]) <= 1))

    def test_preprocessor_short_side(self):
        from pdf_table_tpu.models.dbnet import DbNetConfig, DbNetPreProcessor

        cfg = DbNetConfig(image_short_side=64)
        pre = DbNetPreProcessor(cfg)
        out = pre(make_image(100, 200))
        img = out["image"]
        assert img.shape[0] == 1 and img.shape[3] == 3
        assert img.shape[1] % 32 == 0 and img.shape[2] % 32 == 0
        assert min(img.shape[1], img.shape[2]) == 64
        assert out["org_shape"] == (100, 200)

    def test_postprocessor_finds_bars(self):
        from pdf_table_tpu.models.dbnet import DbNetConfig, DbNetPostProcessor

        cfg = DbNetConfig(thresh=0.5, box_thresh=0.5, unclip_ratio=1.5)
        post = DbNetPostProcessor(cfg)
        prob = np.zeros((96, 128), np.float32)
        prob[30:42, 20:100] = 0.95
        prob[60:72, 20:80] = 0.9
        out = post(prob, (96, 128))
        assert out["det_polygons"].shape[0] == 2
        assert out["det_scores"].min() > 0.5
        # unclipped boxes should cover the original bars
        quads = out["det_polygons"].reshape(-1, 4, 2)
        xs = quads[:, :, 0]
        assert (xs.min(axis=1) <= 20).all()

    def test_device_fast_path_matches_host_roughly(self):
        from pdf_table_tpu.models.dbnet import DbNetConfig, DbNetPostProcessor

        cfg = DbNetConfig(thresh=0.5, box_thresh=0.5)
        post = DbNetPostProcessor(cfg)
        prob = np.zeros((64, 96), np.float32)
        prob[10:20, 10:60] = 0.9
        host = post(prob, (64, 96))
        dev = post.fast_device_boxes(prob, (64, 96), max_components=16)
        assert dev["det_polygons"].shape[0] == host["det_polygons"].shape[0] == 1


class TestRecCTC:
    @pytest.mark.parametrize("backbone", ["crnn", "svtr_lcnet"])
    def test_forward_shapes(self, backbone):
        from pdf_table_tpu.models.rec_ctc import CTCRecModel, RecConfig

        if backbone == "crnn":
            cfg = RecConfig.crnn(vocab_size=37, hidden_size=32)
            x = jnp.zeros((2, 32, 80, 1), jnp.float32)
        else:
            cfg = RecConfig(vocab_size=37)
            x = jnp.zeros((2, 48, 80, 3), jnp.float32)
        model = CTCRecModel(cfg)
        from pdf_table_tpu.engine.params import init_params
        variables = init_params(model, x)
        logits = model.apply(variables, x, train=False)
        assert logits.ndim == 3
        assert logits.shape[0] == 2 and logits.shape[2] == 37

    def test_charset_roundtrip(self):
        from pdf_table_tpu.models.rec_ctc import default_en_charset

        cs = default_en_charset()
        ids = cs.encode("Hello 42!")
        assert cs.decode_ids(ids) == "Hello 42!"

    def test_preprocessor_buckets(self):
        from pdf_table_tpu.models.rec_ctc import RecConfig, RecPreProcessor

        cfg = RecConfig(width_buckets=(80, 160))
        pre = RecPreProcessor(cfg)
        crops = [np.zeros((24, 40, 3), np.uint8),
                 np.zeros((24, 300, 3), np.uint8),
                 np.zeros((24, 42, 3), np.uint8)]
        out = pre(crops)
        buckets = {g["bucket"]: g for g in out["groups"]}
        assert set(buckets) == {80, 160}
        # 40px@h24 -> 80 wide (bucket 80); 42px -> 84 and 300px -> capped,
        # both land in bucket 160
        assert buckets[80]["images"].shape == (1, 48, 80, 3)
        assert sorted(buckets[160]["indices"]) == [1, 2]


class TestTasks:
    def test_detection_task_e2e(self):
        from pdf_table_tpu.tasks import OcrDetectionTask

        task = OcrDetectionTask(model="PP-OCRv4_det", inner_channels=48,
                                limit_side_len=96)
        out = task(make_image(80, 120))
        assert "det_polygons" in out and out["det_polygons"].shape[1] == 8
        assert task.timings["infer"]

    def test_recognition_task_e2e(self):
        from pdf_table_tpu.models.rec_ctc import RecConfig
        from pdf_table_tpu.tasks import OcrRecognitionTask

        cfg = RecConfig(vocab_size=97, width_buckets=(80,))
        task = OcrRecognitionTask(config=cfg)
        crops = [make_image(24, 60, seed=i) for i in range(3)]
        out = task(crops)
        assert len(out["texts"]) == 3
        assert len(out["scores"]) == 3

    def test_registry(self):
        from pdf_table_tpu.models.registry import get_config, list_models

        assert "PP-OCRv4_det" in list_models("detection")
        cfg = get_config("detection", "PP-OCRv4_det")
        assert cfg.backbone == "mobilenetv3"
        with pytest.raises(KeyError):
            get_config("detection", "nope")


class TestLightweightEdge:
    def test_forward(self):
        import jax.numpy as jnp

        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.rec_ctc import CTCRecModel, RecConfig

        cfg = RecConfig(backbone="lightweight_edge", vocab_size=37)
        model = CTCRecModel(cfg)
        x = jnp.zeros((1, 32, 80, 3), jnp.float32)
        variables = init_params(model, x)
        logits = model.apply(variables, x, train=False)
        assert logits.shape[0] == 1 and logits.shape[2] == 37


class TestRegistryComplete:
    def test_all_reference_models_present(self):
        from pdf_table_tpu.models.registry import list_models

        tsr = list_models("table_structure")
        for m in ("Lore", "SLANet", "CenterNet", "Lgpma", "TableMaster",
                  "MtlTabNet"):
            assert m in tsr, m
        assert set(list_models("layout")) >= {"picodet", "DocXLayout"}
        rec = list_models("recognition")
        for m in ("PP-OCRv4_rec", "CRNN", "ConvNextViT", "LightweightEdge"):
            assert m in rec, m


class TestConvNextChunking:
    def test_chunked_preprocess(self):
        from pdf_table_tpu.models.rec_ctc import RecConfig, RecPreProcessor

        cfg = RecConfig.convnext_vit()
        pre = RecPreProcessor(cfg)
        crops = [np.zeros((20, 500, 3), np.uint8),
                 np.zeros((24, 100, 3), np.uint8)]
        out = pre(crops)
        g = out["groups"][0]
        assert g["chunked"] == 3
        assert g["images"].shape == (6, 32, 300, 1)

    def test_task_chunked_decode(self):
        from pdf_table_tpu.models.rec_ctc import RecConfig
        from pdf_table_tpu.tasks import OcrRecognitionTask

        cfg = RecConfig.convnext_vit(vocab_size=37)
        task = OcrRecognitionTask(config=cfg)
        crops = [make_image(20, 400, seed=1), make_image(24, 90, seed=2)]
        out = task(crops)
        assert len(out["texts"]) == 2


class TestProxylessNasDet:
    def test_forward(self):
        import jax.numpy as jnp

        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.dbnet import DBNet, DbNetConfig

        cfg = DbNetConfig(backbone="proxylessnas", inner_channels=32)
        model = DBNet(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        assert out["prob"].shape == (1, 64, 64)
