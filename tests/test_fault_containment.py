"""Deferred device-fault containment (VERDICT r4 #1).

JAX dispatch is asynchronous: a runtime re-execution fault on a compiled
program raises at the next BLOCKING download (np.asarray / eager concat),
not at the dispatch call. These tests inject poisoned handles at exactly
those points and assert the pipeline re-runs the affected work through
host fallbacks instead of emitting error/empty results — the round-4
official bench died on this exact hole
(tasks/table_structure.py fetch_concat)."""

import numpy as np
import pytest

import jax


class FakeJaxRuntimeError(RuntimeError):
    """Name-compatible stand-in (is_device_fault matches by type name)."""


FakeJaxRuntimeError.__name__ = "JaxRuntimeError"


class PoisonedHandle:
    """Mimics a jax.Array whose async computation failed: any blocking
    read raises, shape metadata is available (like a real handle)."""

    def __init__(self, shape, dtype=np.float32):
        self.shape = shape
        self.dtype = dtype
        self.ndim = len(shape)

    def __array__(self, *a, **k):
        raise FakeJaxRuntimeError(
            "INVALID_ARGUMENT: Execution supplied 1 buffers but expected 2")

    def copy_to_host_async(self):
        pass


class TestIsDeviceFault:
    def test_matches_jax_runtime_error(self):
        from pdf_table_tpu.utils.fault import is_device_fault

        assert is_device_fault(FakeJaxRuntimeError("x"))
        try:
            import jax.errors
            exc = jax.errors.JaxRuntimeError("INVALID_ARGUMENT: boom")
        except Exception:
            exc = None
        if exc is not None:
            assert is_device_fault(exc)

    def test_rejects_code_bugs(self):
        from pdf_table_tpu.utils.fault import is_device_fault

        assert not is_device_fault(ValueError("bad arg"))
        assert not is_device_fault(IndexError("oops"))
        assert not is_device_fault(RuntimeError("plain runtime"))

    def test_walks_cause_chain(self):
        from pdf_table_tpu.utils.fault import is_device_fault

        try:
            try:
                raise FakeJaxRuntimeError("inner")
            except FakeJaxRuntimeError as e:
                raise ValueError("wrapper") from e
        except ValueError as outer:
            assert is_device_fault(outer)


def _make_lore_task(**kw):
    from pdf_table_tpu.models.lore import LoreConfig
    from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

    cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                     task_type="wtw", wiz_rev=True, max_objs=6,
                     max_corners=12, hidden_size=32, tsfm_layers=1,
                     stacking_layers=1, num_heads=2, d_ff=32,
                     head_conv=16, vis_thresh=0.0)
    return OcrTableStructureTask(model="Lore", config=cfg, **kw)


def _pages_and_regions(seed=3):
    rng = np.random.default_rng(seed)
    pages = jax.device_put(
        rng.integers(0, 255, (2, 128, 96, 3)).astype(np.uint8))
    regions = [(0, (10, 10, 70, 60)), (1, (4, 8, 90, 120))]
    return pages, regions


class TestTsrFaultLadder:
    def test_poisoned_glrf_falls_back_to_host_refine(self):
        """Rung (a)->(b): the fused refine+gl program dispatches fine but
        its output is poisoned — the fault surfaces at fetch_concat's
        blocking download. The chunk must re-run via the host-refine
        detour and return REAL results (not raise, not empty)."""
        task = _make_lore_task(wiz_device_refine=True)
        task.ensure_built()
        ref = _make_lore_task(wiz_device_refine=False)
        ref.ensure_built()
        ref._params = task._params
        pages, regions = _pages_and_regions()
        want = ref.batch_infer_from_pages(pages, regions)

        real_glrf = task._wiz_parts["glrf"]

        def poisoned_glrf(v, ax, cr, dc):
            out = real_glrf(v, ax, cr, dc)   # keep shapes honest
            return PoisonedHandle(tuple(out.shape))

        task._wiz_parts["glrf"] = poisoned_glrf
        got = task.batch_infer_from_pages(pages, regions)
        assert task.wiz_device_refine is False   # permanently detoured
        assert len(got) == len(want) == 2
        for g, w in zip(got, want):
            assert len(g["cells"]) == len(w["cells"])
            for gc, wc in zip(g["cells"], w["cells"]):
                np.testing.assert_allclose(
                    np.asarray(gc["poly"], np.float32),
                    np.asarray(wc["poly"], np.float32), atol=1e-3)

    def test_device_section_fault_falls_back_to_host_crops(self):
        """Rung (c): the whole batched device section faults even after
        the detour — the chunk re-runs through host crops + batch_infer
        and still yields per-region results."""
        task = _make_lore_task(wiz_device_refine=False)
        task.ensure_built()
        pages, regions = _pages_and_regions()

        def always_fault(pages_dev, regions_):
            raise FakeJaxRuntimeError("INVALID_ARGUMENT: TPU backend error")

        task._lore_infer_from_pages = always_fault
        got = task.batch_infer_from_pages(pages, regions)
        assert len(got) == 2
        assert all("cells" in r for r in got)

    def test_code_bug_propagates(self):
        """Non-device exceptions must NOT be retried/masked."""
        task = _make_lore_task(wiz_device_refine=True)
        task.ensure_built()
        pages, regions = _pages_and_regions()

        def buggy(pages_dev, regions_):
            raise IndexError("real bug")

        task._lore_infer_from_pages = buggy
        with pytest.raises(IndexError):
            task.batch_infer_from_pages(pages, regions)
        assert task.wiz_device_refine is True    # untouched

    def test_serial_call_fault_retries_with_host_detour(self):
        """The serial single-crop path: a deferred fault surfacing inside
        _postprocess's blocking download re-runs the crop via the host
        detour (the dispatch-time try in apply_fn_wiz_rev cannot see
        it)."""
        task = _make_lore_task(wiz_device_refine=True)
        task.ensure_built()
        real_glrf = task._wiz_parts["glrf"]
        state = {"n": 0}

        def poisoned_glrf(v, ax, cr, dc):
            state["n"] += 1
            out = real_glrf(v, ax, cr, dc)
            return PoisonedHandle(tuple(out.shape))

        task._wiz_parts["glrf"] = poisoned_glrf
        rng = np.random.default_rng(0)
        crop = rng.integers(0, 255, (50, 40, 3)).astype(np.uint8)
        out = task(crop)
        assert state["n"] == 1               # poisoned program ran once
        assert task.wiz_device_refine is False
        assert "cells" in out


class TestRunnerFaultContainment:
    def _mini_pipeline(self):
        from pdf_table_tpu.pipeline.batch_runner import BatchPipeline
        from pdf_table_tpu.pipeline.system import OcrSystemConfig

        cfg = OcrSystemConfig(use_layout=False, use_table=False,
                              use_orientation_cls=False,
                              use_textline_cls=False)
        return BatchPipeline(cfg, batch_pages=2)

    def test_recognize_chunk_falls_back_to_host(self):
        bp = self._mini_pipeline()
        rng = np.random.default_rng(1)
        canv = rng.integers(0, 255, (1, 128, 96, 3)).astype(np.uint8)
        quads = [np.array([[[10, 10], [80, 10], [80, 30], [10, 30]]],
                          np.float32)]

        calls = {"dev": 0, "host": 0}

        def dev_fault(canv_dev, q):
            calls["dev"] += 1
            raise FakeJaxRuntimeError("INVALID_ARGUMENT: TPU backend error")

        def host_ok(imgs, q):
            calls["host"] += 1
            return ([["ok"]], [[0.9]])

        bp._recognize_all_device = dev_fault
        bp._recognize_all = host_ok
        texts, scores = bp._recognize_chunk(canv, [canv[0]], quads,
                                            use_dev=True)
        assert calls == {"dev": 1, "host": 1}
        assert texts == [["ok"]] and scores == [[0.9]]

    def test_recognize_chunk_code_bug_propagates(self):
        bp = self._mini_pipeline()

        def dev_bug(canv_dev, q):
            raise KeyError("bug")

        bp._recognize_all_device = dev_bug
        with pytest.raises(KeyError):
            bp._recognize_chunk(None, [], [], use_dev=True)
