"""bench.py harness pieces that must not rot: the device-init watchdog
and the synthetic page generator (the bench itself needs the chip)."""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench as B  # noqa: E402


class TestBenchHarness:
    def test_device_watchdog_passes_on_live_backend(self):
        # CPU backend initializes immediately -> True well under budget
        t0 = time.perf_counter()
        assert B._check_device_responsive(timeout_s=60.0)
        assert time.perf_counter() - t0 < 30

    def test_device_watchdog_times_out_on_hang(self, monkeypatch):
        # a probe that never returns must not hang main(): the daemon
        # thread stays blocked, the caller gets False at the deadline
        ev = threading.Event()

        class FakeJax:
            @staticmethod
            def devices():
                ev.wait(30)  # "forever" at test scale

        monkeypatch.setitem(sys.modules, "jax", FakeJax)
        t0 = time.perf_counter()
        assert not B._check_device_responsive(timeout_s=0.5)
        assert time.perf_counter() - t0 < 5
        ev.set()

    def test_make_page_shape_and_content(self):
        img = B.make_page(3)
        assert img.shape == (1224, 950, 3) and img.dtype == np.uint8
        assert (img == 255).mean() > 0.5       # mostly white page
        assert (img < 100).any()               # with dark text bars
        # deterministic per seed
        np.testing.assert_array_equal(img, B.make_page(3))


class TestOrganicDetSetup:
    def test_bar_page_boxes(self):
        import numpy as np

        import bench

        rng = np.random.default_rng(0)
        img, boxes = bench.bench_bar_page(rng, 320)
        assert img.shape == (320, 320, 3)
        assert len(boxes) >= 8
        for x1, y1, x2, y2 in boxes:
            assert 0 <= x1 < x2 <= 320 and 0 <= y1 < y2 <= 320
            assert (img[y1:y2, x1:x2] < 200).all()

    def test_cached_weights_short_circuit(self, monkeypatch, tmp_path):
        """With cached demo weights present, ensure_bench_det_weights
        loads them without training (the once-per-machine path)."""
        import bench
        from pdf_table_tpu.engine import params as P

        sentinel = {"params": {"w": 1}}
        monkeypatch.setattr(P, "has_saved_params", lambda d: True)
        monkeypatch.setattr(P, "load_params", lambda d: sentinel)

        class FakeCfg:
            thresh = 0.45
            box_thresh = 0.0

        class FakeDet:
            model_config = FakeCfg()

            def ensure_built(self):
                pass

        class FakeSystem:
            det_task = FakeDet()

        class FakeBp:
            system = FakeSystem()

        assert bench.ensure_bench_det_weights(FakeBp()) is True
        assert FakeBp.system.det_task._params is sentinel
        # trained weights flip the det to reference-like thresholds
        assert FakeBp.system.det_task.model_config.thresh == 0.3
        assert FakeBp.system.det_task.model_config.box_thresh == 0.55
