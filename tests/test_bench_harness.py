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
