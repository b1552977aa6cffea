"""bench.py harness pieces that must not rot: the device-init watchdog
and the synthetic page generator (the bench itself needs the chip)."""

import os
import sys
import threading
import time

import jax
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


class TestMeasurementHonesty:
    """A wedged device session turns bp.run into a microsecond error-page
    sweep; the first round-5 bench tail reported 299 'pages/s' of error
    pages. Every timed section must refuse such measurements."""

    @staticmethod
    def _results(n, n_err):
        class R:
            pass

        out = []
        for i in range(n):
            r = R()
            r.metric = {"error": "JaxRuntimeError: wedged"} if i < n_err \
                else {}
            out.append(r)
        return out

    def test_n_error_pages(self):
        assert B.n_error_pages(self._results(8, 3)) == 3
        assert B.n_error_pages(self._results(8, 0)) == 0
        # outputs without a metric dict don't crash the counter
        assert B.n_error_pages([object()]) == 0

    def test_timed_run_raises_on_error_pages(self):
        res = self._results(4, 2)

        class FakeBp:
            def run(self, pages):
                return res

        import pytest

        with pytest.raises(RuntimeError, match="error pages"):
            B.timed_run(FakeBp(), [{}] * 4)

    def test_timed_run_passes_clean(self):
        res = self._results(4, 0)

        class FakeBp:
            def run(self, pages):
                time.sleep(0.01)
                return res

        pps, got = B.timed_run(FakeBp(), [{}] * 4)
        assert got is res and 0 < pps < 4 / 0.01


class TestAxonGate:
    def test_is_axon_backend_false_on_cpu(self):
        from pdf_table_tpu.utils.fault import is_axon_backend

        assert is_axon_backend() is False

    def test_wiz_refine_gate_uses_fingerprint(self, monkeypatch):
        """jax.default_backend() reports 'tpu' for the axon plugin, so the
        r4 gate (!= 'axon') never fired and the session-wedging fused
        refine program kept dispatching on the tunnel. The gate must go
        through utils.fault.is_axon_backend."""
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask
        from pdf_table_tpu.utils import fault

        monkeypatch.setattr(fault, "is_axon_backend", lambda: True)
        t = OcrTableStructureTask(
            model="Lore", task_type="wtw",
            config=_tiny_lore_cfg())
        assert t.wiz_device_refine is None   # lazy until build
        t.ensure_built()
        assert t.wiz_device_refine is False

        monkeypatch.setattr(fault, "is_axon_backend", lambda: False)
        t2 = OcrTableStructureTask(
            model="Lore", task_type="wtw",
            config=_tiny_lore_cfg())
        t2.ensure_built()
        assert t2.wiz_device_refine is True


def _tiny_lore_cfg():
    from pdf_table_tpu.models.lore import LoreConfig

    return LoreConfig(backbone="resnet18", resolution=(64, 64),
                      task_type="wtw", wiz_rev=True, max_objs=4,
                      max_corners=8, hidden_size=16, tsfm_layers=1,
                      stacking_layers=1, num_heads=2, d_ff=16,
                      head_conv=8, vis_thresh=0.0)


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
        # loaded params are committed to device once (numpy trees would
        # re-upload per jitted call over the tunnel — round-5 det fix)
        committed = FakeBp.system.det_task._params
        assert isinstance(committed["params"]["w"], jax.Array)
        assert int(committed["params"]["w"]) == 1
        # trained weights flip the det to reference-like thresholds
        assert FakeBp.system.det_task.model_config.thresh == 0.3
        assert FakeBp.system.det_task.model_config.box_thresh == 0.55
