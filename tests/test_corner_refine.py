"""LORE wiz_rev corner refinement: vectorized implementation vs a
sequential numpy emulator of the reference loop
(lineless_table_process.py:178-236)."""

import numpy as np

import jax.numpy as jnp


def _inside(quad, p):
    v0 = quad
    v1 = np.roll(quad, -1, axis=0)
    e = v1 - v0
    r = p[None] - v0
    cross = e[:, 0] * r[:, 1] - e[:, 1] * r[:, 0]
    return bool(np.all(cross > 0) or np.all(cross < 0))


def sequential_refine(dets, scores, gboxes, gcenters, gscores,
                      vis_thresh=0.2, vis_thresh_corner=0.3):
    """Direct transcription of the reference's double loop semantics."""
    K, M = len(dets), len(gboxes)
    rev = dets.copy()
    out_scores = scores.copy()
    for i in range(K):
        if scores[i] < vis_thresh:
            break       # boxes sorted by score
        count = 0
        for j in range(M):
            if gscores[j] < vis_thresh_corner:
                break   # corners sorted by score
            bb = dets[i].reshape(4, 2)
            gb = gboxes[j].reshape(4, 2)
            if (bb[:, 0].min() > gb[:, 0].max()
                    or gb[:, 0].min() > bb[:, 0].max()
                    or bb[:, 1].min() > gb[:, 1].max()
                    or gb[:, 1].min() > bb[:, 1].max()):
                continue
            if not any(_inside(bb, gb[v]) for v in range(4)):
                continue
            cx, cy = gcenters[j]
            d = (bb[:, 0] - cx) ** 2 + (bb[:, 1] - cy) ** 2
            v = int(np.argmin(d))
            origin = dets[i, 2 * v:2 * v + 2]
            old = rev[i, 2 * v:2 * v + 2]
            if np.all(old == origin):
                count += 1
                rev[i, 2 * v], rev[i, 2 * v + 1] = cx, cy
            else:
                d_old = np.sum((origin - old) ** 2)
                d_new = (origin[0] - cx) ** 2 + (origin[1] - cy) ** 2
                if d_old >= d_new:
                    count += 1
                    rev[i, 2 * v], rev[i, 2 * v + 1] = cx, cy
        if count <= 2:
            out_scores[i] = scores[i] * 0.4
    return rev, out_scores


def make_case(rng, K=12, M=24):
    """Random cells on a grid + corner detections near cell vertices."""
    dets = np.zeros((K, 8), np.float32)
    for i in range(K):
        x, y = rng.uniform(5, 80, 2)
        w, h = rng.uniform(8, 20, 2)
        dets[i] = [x, y, x + w, y, x + w, y + h, x, y + h]
        dets[i, 0::2] += rng.normal(0, 0.3, 4)
        dets[i, 1::2] += rng.normal(0, 0.3, 4)
    scores = np.sort(rng.uniform(0.05, 0.95, K).astype(np.float32))[::-1]
    # corners: jittered copies of random cell vertices, group box = the cell
    gboxes = np.zeros((M, 8), np.float32)
    gcenters = np.zeros((M, 2), np.float32)
    for j in range(M):
        i = rng.integers(0, K)
        v = rng.integers(0, 4)
        gboxes[j] = dets[i] + rng.normal(0, 0.5, 8)
        gcenters[j] = dets[i, 2 * v:2 * v + 2] + rng.normal(0, 1.0, 2)
    gscores = np.sort(rng.uniform(0.1, 0.9, M).astype(np.float32))[::-1]
    return dets, scores, gboxes, gcenters, gscores


class TestCornerRefine:
    def test_matches_sequential_reference(self):
        from pdf_table_tpu.models.lore.corner_refine import \
            refine_vertices_by_corners

        for seed in range(5):
            rng = np.random.default_rng(seed)
            dets, scores, gboxes, gcenters, gscores = make_case(rng)
            want_d, want_s = sequential_refine(dets, scores, gboxes,
                                               gcenters, gscores)
            got_d, got_s = refine_vertices_by_corners(
                jnp.asarray(dets[None]), jnp.asarray(scores[None].copy()),
                jnp.asarray(gboxes[None]), jnp.asarray(gcenters[None]),
                jnp.asarray(gscores[None].copy()), 0.2, 0.3)
            np.testing.assert_allclose(np.asarray(got_d[0]), want_d,
                                       atol=1e-5, err_msg=f"seed {seed}")
            np.testing.assert_allclose(np.asarray(got_s[0]), want_s,
                                       atol=1e-6, err_msg=f"seed {seed}")

    def test_lore_wtw_decode_with_wiz_rev(self):
        import jax

        from pdf_table_tpu.engine.params import init_params
        from pdf_table_tpu.models.lore import LoreConfig, LoreModel

        cfg = LoreConfig.wtw(resolution=(64, 64), max_objs=8,
                             max_corners=16, hidden_size=32, head_conv=16,
                             tsfm_layers=1, stacking_layers=1, num_heads=4,
                             d_ff=32, max_fmp_size=64, backbone="resnet18")
        assert cfg.wiz_rev
        model = LoreModel(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = init_params(model, x)
        out = model.apply(variables, x, train=False)
        assert out["dets"].shape == (1, 8, 8)
        assert out["scores"].shape == (1, 8)
        assert np.all(np.diff(np.asarray(out["scores"][0])) <= 1e-6)


class TestDeviceRefinePath:
    """wiz_device_refine=True (refine+sort as its own device program, no
    host round trip) must produce the same packed output as the host
    numpy-refine detour, through both _run_model and the batched
    from-pages path."""

    def _make_task(self, **kw):
        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         task_type="wtw", wiz_rev=True, max_objs=6,
                         max_corners=12, hidden_size=32, tsfm_layers=1,
                         stacking_layers=1, num_heads=2, d_ff=32,
                         head_conv=16, vis_thresh=0.0)
        return OcrTableStructureTask(model="Lore", config=cfg, **kw)

    def test_run_model_parity(self):
        import numpy as np

        dev = self._make_task(wiz_device_refine=True)
        host = self._make_task(wiz_device_refine=False)
        dev.ensure_built()
        host.ensure_built()
        host._params = dev._params
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.float32)
        norm = (img[..., ::-1] / 255.0
                - np.array([0.408, 0.447, 0.470], np.float32)) \
            / np.array([0.289, 0.274, 0.278], np.float32)
        got = np.asarray(dev._run_model({"image": norm})["packed"])
        want = np.asarray(host._run_model({"image": norm})["packed"])
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_batched_from_pages_parity(self):
        import jax
        import numpy as np

        dev = self._make_task(wiz_device_refine=True)
        host = self._make_task(wiz_device_refine=False)
        dev.ensure_built()
        host.ensure_built()
        host._params = dev._params
        rng = np.random.default_rng(2)
        pages = jax.device_put(
            rng.integers(0, 255, (2, 128, 96, 3)).astype(np.uint8))
        regions = [(0, (10, 10, 70, 60)), (1, (4, 8, 90, 120))]
        got = dev.batch_infer_from_pages(pages, regions)
        want = host.batch_infer_from_pages(pages, regions)
        assert len(got) == len(want) == 2
        for g, w in zip(got, want):
            assert len(g["cells"]) == len(w["cells"])
            for gc, wc in zip(g["cells"], w["cells"]):
                np.testing.assert_allclose(
                    np.asarray(gc["poly"], np.float32),
                    np.asarray(wc["poly"], np.float32), atol=1e-3)
                assert gc["logic"] == wc["logic"]


class TestHostRefinePath:
    """The wiz_rev host-refine path (detect_decode -> numpy refine ->
    gather_logical) must equal the fused LoreModel.__call__."""

    def test_task_matches_model_call(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.models.lore.model import LoreModel
        from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         task_type="wtw", wiz_rev=True, max_objs=6,
                         max_corners=12, hidden_size=32, tsfm_layers=1,
                         stacking_layers=1, num_heads=2, d_ff=32,
                         head_conv=16, vis_thresh=0.0)
        task = OcrTableStructureTask(model="Lore", config=cfg)
        task.ensure_built()
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.float32)
        norm = (img[..., ::-1] / 255.0
                - np.array([0.408, 0.447, 0.470], np.float32)) \
            / np.array([0.289, 0.274, 0.278], np.float32)
        raw = task._run_model({"image": norm})
        packed = np.asarray(raw["packed"])
        un = task._unpack_lore(packed)

        model = LoreModel(cfg)
        ref = model.apply(task._params, jnp.asarray(norm), train=False)
        assert np.allclose(un["dets"], np.asarray(ref["dets"]), atol=1e-4)
        assert np.allclose(un["scores"], np.asarray(ref["scores"]),
                           atol=1e-5)
        assert np.allclose(un["stacked_logi"],
                           np.asarray(ref["stacked_logi"]), atol=1e-3)
