"""Training-slice + eval tests: targets, loss, trainer step, metrics, TEDS."""

import json
import os

import numpy as np
import pytest


class TestTargets:
    def test_gaussian_radius_positive(self):
        from pdf_table_tpu.data import gaussian_radius

        assert gaussian_radius((10, 20)) > 0

    def test_draw_gaussian_peak(self):
        from pdf_table_tpu.data import draw_gaussian

        hm = np.zeros((32, 32), np.float32)
        draw_gaussian(hm, (16, 16), 3)
        assert hm[16, 16] == 1.0
        assert hm[16, 19] < 1.0 and hm[16, 19] > 0.0

    def test_make_lore_targets(self):
        from pdf_table_tpu.data import make_lore_targets

        quads = np.array([[2, 2, 10, 2, 10, 6, 2, 6]], np.float32)
        logic = np.array([[0, 0, 1, 1]], np.float32)
        t = make_lore_targets(quads, logic, (16, 16), max_objs=4)
        assert t["hm"].shape == (16, 16, 2)
        assert t["hm_mask"][0] == 1.0 and t["hm_mask"][1] == 0.0
        cx, cy = 6, 4
        assert t["hm_ind"][0] == cy * 16 + cx
        assert t["hm"][cy, cx, 0] == 1.0
        # wh decode convention: corner = center - wh
        assert np.allclose(cx - t["wh"][0, 0::2],
                           quads[0, 0::2], atol=1.0)
        assert (t["logic"][0] == logic[0]).all()


class TestWtwDataset:
    def _make_dataset(self, tmp_path):
        import cv2

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        img = np.full((64, 64, 3), 255, np.uint8)
        cv2.rectangle(img, (8, 8), (56, 56), 0, 2)
        cv2.imwrite(str(img_dir / "t1.jpg"), img)
        coco = {
            "images": [{"id": 1, "file_name": "t1.jpg",
                        "width": 64, "height": 64}],
            "annotations": [
                {"id": 1, "image_id": 1,
                 "segmentation": [[8, 8, 32, 8, 32, 32, 8, 32]],
                 "logic_axis": [[0, 0, 0, 0]], "bbox": [8, 8, 24, 24]},
                {"id": 2, "image_id": 1,
                 "segmentation": [[32, 8, 56, 8, 56, 32, 32, 32]],
                 "logic_axis": [[0, 0, 1, 1]], "bbox": [32, 8, 24, 24]},
            ],
        }
        label = tmp_path / "coco.json"
        label.write_text(json.dumps(coco))
        return str(img_dir), str(label)

    def test_dataset_targets(self, tmp_path):
        from pdf_table_tpu.data import WtwDataset
        from pdf_table_tpu.models.lore import LoreConfig

        img_dir, label = self._make_dataset(tmp_path)
        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         max_objs=8)
        ds = WtwDataset(img_dir, label, config=cfg)
        assert len(ds) == 1
        item = ds[0]
        assert item["image"].shape == (64, 64, 3)
        assert item["hm"].shape == (16, 16, 2)
        assert item["hm_mask"].sum() == 2.0
        batch = ds.batch([0])
        assert batch["image"].shape == (1, 64, 64, 3)


class TestLoreLossAndTrainer:
    def test_loss_values_finite(self):
        import jax.numpy as jnp

        from pdf_table_tpu.train.lore_loss import lore_loss

        B, H, W, M = 1, 16, 16, 4
        outputs = {
            "heads": {"wh": jnp.zeros((B, H, W, 8)),
                      "reg": jnp.zeros((B, H, W, 2))},
            "hm": jnp.full((B, H, W, 2), 0.01),
            "logi": jnp.zeros((B, M, 4)),
            "stacked_logi": jnp.zeros((B, M, 4)),
        }
        batch = {
            "hm": jnp.zeros((B, H, W, 2)),
            "hm_ind": jnp.zeros((B, M), jnp.int32),
            "hm_mask": jnp.ones((B, M)),
            "wh": jnp.ones((B, M, 8)),
            "reg": jnp.zeros((B, M, 2)),
            "logic": jnp.ones((B, M, 4)),
        }
        losses = lore_loss(outputs, batch)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
        assert float(losses["wh_l"]) == pytest.approx(1.0, abs=1e-3)
        assert float(losses["ax_l"]) == pytest.approx(1.0, abs=1e-3)

    def test_trainer_two_steps_loss_decreases(self, tmp_path):
        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.train.lore_trainer import (LoreTrainArgs,
                                                      LoreTrainer)

        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         max_objs=4, hidden_size=32, head_conv=16,
                         tsfm_layers=1, stacking_layers=1, num_heads=4,
                         max_fmp_size=64)
        args = LoreTrainArgs(learning_rate=1e-3, batch_size=1,
                             total_steps=10, save_every=0,
                             output_dir=str(tmp_path))
        trainer = LoreTrainer(cfg, args)
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.normal(size=(1, 64, 64, 3)).astype(np.float32),
            "hm": np.zeros((1, 16, 16, 2), np.float32),
            "hm_ind": np.zeros((1, 4), np.int64),
            "hm_mask": np.ones((1, 4), np.float32),
            "wh": np.ones((1, 4, 8), np.float32),
            "reg": np.zeros((1, 4, 2), np.float32),
            "logic": np.ones((1, 4, 4), np.float32),
            "gt_dets": np.ones((1, 4, 8), np.float32),
        }
        batch["hm"][0, 4, 4, 0] = 1.0
        m1 = trainer.train_step(batch)
        for _ in range(4):
            m2 = trainer.train_step(batch)
        assert m2["loss"] < m1["loss"]
        ckpt = trainer.save_checkpoint(str(tmp_path / "ck"))
        trainer.restore_checkpoint(ckpt)

    def test_async_checkpoint_roundtrip(self, tmp_path):
        """Non-blocking save (orbax AsyncCheckpointer): training continues
        while the checkpoint commits; after the wait barrier the restored
        params equal the saved ones."""
        import jax

        from pdf_table_tpu.engine.params import wait_for_async_saves
        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.train.lore_trainer import (LoreTrainArgs,
                                                      LoreTrainer)

        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         max_objs=4, hidden_size=32, head_conv=16,
                         tsfm_layers=1, stacking_layers=1, num_heads=4,
                         max_fmp_size=64)
        args = LoreTrainArgs(learning_rate=1e-3, batch_size=1,
                             total_steps=4, save_every=0,
                             output_dir=str(tmp_path))
        trainer = LoreTrainer(cfg, args)
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.normal(size=(1, 64, 64, 3)).astype(np.float32),
            "hm": np.zeros((1, 16, 16, 2), np.float32),
            "hm_ind": np.zeros((1, 4), np.int64),
            "hm_mask": np.ones((1, 4), np.float32),
            "wh": np.ones((1, 4, 8), np.float32),
            "reg": np.zeros((1, 4, 2), np.float32),
            "logic": np.ones((1, 4, 4), np.float32),
            "gt_dets": np.ones((1, 4, 8), np.float32),
        }
        batch["hm"][0, 4, 4, 0] = 1.0
        trainer.train_step(batch)
        ckpt = trainer.save_checkpoint(str(tmp_path / "ck_async"),
                                       blocking=False)
        saved = jax.device_get(trainer.state.params)
        trainer.train_step(batch)  # train continues during the commit
        wait_for_async_saves()
        trainer.restore_checkpoint(ckpt)
        restored = jax.device_get(trainer.state.params)
        a = jax.tree.leaves(saved)
        b = jax.tree.leaves(restored)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


    def test_remat_matches_plain_grads(self, tmp_path):
        """jax.checkpoint train step: same loss and same updated params
        as the non-remat step (activation memory is the only difference)."""
        import jax

        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.train.lore_trainer import (LoreTrainArgs,
                                                      LoreTrainer)

        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         max_objs=4, hidden_size=32, head_conv=16,
                         tsfm_layers=1, stacking_layers=1, num_heads=4,
                         max_fmp_size=64)
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.normal(size=(1, 64, 64, 3)).astype(np.float32),
            "hm": np.zeros((1, 16, 16, 2), np.float32),
            "hm_ind": np.zeros((1, 4), np.int64),
            "hm_mask": np.ones((1, 4), np.float32),
            "wh": np.ones((1, 4, 8), np.float32),
            "reg": np.zeros((1, 4, 2), np.float32),
            "logic": np.ones((1, 4, 4), np.float32),
            "gt_dets": np.ones((1, 4, 8), np.float32),
        }
        batch["hm"][0, 4, 4, 0] = 1.0
        metrics, params = {}, {}
        for remat in (False, True):
            args = LoreTrainArgs(learning_rate=1e-3, batch_size=1,
                                 save_every=0, output_dir=str(tmp_path),
                                 remat=remat)
            tr = LoreTrainer(cfg, args)
            metrics[remat] = tr.train_step(batch)
            params[remat] = jax.device_get(tr.state.params)
        assert abs(metrics[False]["loss"] - metrics[True]["loss"]) < 1e-5
        for a, b in zip(jax.tree.leaves(params[False]),
                        jax.tree.leaves(params[True])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_grad_accum_matches_full_batch(self, tmp_path):
        """accum_steps=2 over a batch of two identical halves produces the
        same update as one full-batch step (mean-of-means == full mean)."""
        import jax

        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.train.lore_trainer import (LoreTrainArgs,
                                                      LoreTrainer)

        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         max_objs=4, hidden_size=32, head_conv=16,
                         tsfm_layers=1, stacking_layers=1, num_heads=4,
                         max_fmp_size=64)
        rng = np.random.default_rng(0)
        one = {
            "image": rng.normal(size=(1, 64, 64, 3)).astype(np.float32),
            "hm": np.zeros((1, 16, 16, 2), np.float32),
            "hm_ind": np.zeros((1, 4), np.int64),
            "hm_mask": np.ones((1, 4), np.float32),
            "wh": np.ones((1, 4, 8), np.float32),
            "reg": np.zeros((1, 4, 2), np.float32),
            "logic": np.ones((1, 4, 4), np.float32),
            "gt_dets": np.ones((1, 4, 8), np.float32),
        }
        one["hm"][0, 4, 4, 0] = 1.0
        batch = {k: np.concatenate([v, v]) for k, v in one.items()}
        params = {}
        for accum in (1, 2):
            args = LoreTrainArgs(learning_rate=1e-3, batch_size=2,
                                 save_every=0, output_dir=str(tmp_path),
                                 grad_accum_steps=accum)
            tr = LoreTrainer(cfg, args)
            m = tr.train_step(batch)
            assert np.isfinite(m["loss"])
            params[accum] = jax.device_get(tr.state.params)
        for a, b in zip(jax.tree.leaves(params[1]),
                        jax.tree.leaves(params[2])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_full_state_resume_bit_exact(self, tmp_path):
        """save_train_state/restore_train_state: 2 steps + save + 2 steps
        equals restore-into-a-fresh-trainer + 2 steps (optimizer moments
        and the LR-schedule position survive; params-only restore would
        diverge)."""
        import jax

        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.train.lore_trainer import (LoreTrainArgs,
                                                      LoreTrainer)

        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         max_objs=4, hidden_size=32, head_conv=16,
                         tsfm_layers=1, stacking_layers=1, num_heads=4,
                         max_fmp_size=64)
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.normal(size=(1, 64, 64, 3)).astype(np.float32),
            "hm": np.zeros((1, 16, 16, 2), np.float32),
            "hm_ind": np.zeros((1, 4), np.int64),
            "hm_mask": np.ones((1, 4), np.float32),
            "wh": np.ones((1, 4, 8), np.float32),
            "reg": np.zeros((1, 4, 2), np.float32),
            "logic": np.ones((1, 4, 4), np.float32),
            "gt_dets": np.ones((1, 4, 8), np.float32),
        }
        batch["hm"][0, 4, 4, 0] = 1.0

        def mk():
            return LoreTrainer(cfg, LoreTrainArgs(
                learning_rate=1e-3, batch_size=1, save_every=0,
                warmup_steps=3, output_dir=str(tmp_path)))

        a = mk()
        a.train_step(batch)
        a.train_step(batch)
        ck = a.save_train_state(str(tmp_path / "ts"))
        a.train_step(batch)
        a.train_step(batch)

        b = mk()
        b.restore_train_state(ck, sample_batch=batch)
        assert int(b.state.step) == 2
        b.train_step(batch)
        b.train_step(batch)
        for x, y in zip(jax.tree.leaves(jax.device_get(a.state.params)),
                        jax.tree.leaves(jax.device_get(b.state.params))):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-7)

    def test_fit_prefetch_and_eval_hook(self, tmp_path):
        """fit(): prefetch-threaded batches, eval hook + best-model full
        train-state save at the best eval metric."""
        import os

        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.train.lore_trainer import (LoreTrainArgs,
                                                      LoreTrainer)

        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         max_objs=4, hidden_size=32, head_conv=16,
                         tsfm_layers=1, stacking_layers=1, num_heads=4,
                         max_fmp_size=64)
        rng = np.random.default_rng(0)
        item = {
            "image": rng.normal(size=(64, 64, 3)).astype(np.float32),
            "hm": np.zeros((16, 16, 2), np.float32),
            "hm_ind": np.zeros((4,), np.int64),
            "hm_mask": np.ones((4,), np.float32),
            "wh": np.ones((4, 8), np.float32),
            "reg": np.zeros((4, 2), np.float32),
            "logic": np.ones((4, 4), np.float32),
            "gt_dets": np.ones((4, 8), np.float32),
        }
        item["hm"][4, 4, 0] = 1.0

        class Stub:
            def __len__(self):
                return 4

            def batch(self, idx):
                return {k: np.stack([v] * len(idx)) for k, v in
                        item.items()}

        args = LoreTrainArgs(learning_rate=1e-3, batch_size=1,
                             save_every=0, log_every=100,
                             output_dir=str(tmp_path))
        tr = LoreTrainer(cfg, args)
        evals = []

        def eval_fn(trainer):
            evals.append(int(trainer.state.step))
            return {"loss": float(trainer.history[-1]["loss"])}

        hist = tr.fit(Stub(), steps=5, eval_fn=eval_fn, eval_every=2)
        assert len(hist) == 5
        assert evals == [3, 5]  # steps 2 and 4 fire after the step ran
        assert any("eval_loss" in h for h in hist)
        assert os.path.isdir(os.path.join(str(tmp_path), "best_model"))

    def test_remat_and_accum_compose(self, tmp_path):
        """remat + grad accumulation together: still matches the plain
        full-batch step on duplicated halves."""
        import jax

        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.train.lore_trainer import (LoreTrainArgs,
                                                      LoreTrainer)

        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         max_objs=4, hidden_size=32, head_conv=16,
                         tsfm_layers=1, stacking_layers=1, num_heads=4,
                         max_fmp_size=64)
        rng = np.random.default_rng(2)
        one = {
            "image": rng.normal(size=(1, 64, 64, 3)).astype(np.float32),
            "hm": np.zeros((1, 16, 16, 2), np.float32),
            "hm_ind": np.zeros((1, 4), np.int64),
            "hm_mask": np.ones((1, 4), np.float32),
            "wh": np.ones((1, 4, 8), np.float32),
            "reg": np.zeros((1, 4, 2), np.float32),
            "logic": np.ones((1, 4, 4), np.float32),
            "gt_dets": np.ones((1, 4, 8), np.float32),
        }
        one["hm"][0, 4, 4, 0] = 1.0
        batch = {k: np.concatenate([v, v]) for k, v in one.items()}
        params = {}
        for label, remat, accum in (("plain", False, 1),
                                    ("ladder", True, 2)):
            args = LoreTrainArgs(learning_rate=1e-3, batch_size=2,
                                 save_every=0, output_dir=str(tmp_path),
                                 remat=remat, grad_accum_steps=accum)
            tr = LoreTrainer(cfg, args)
            m = tr.train_step(batch)
            assert np.isfinite(m["loss"])
            params[label] = jax.device_get(tr.state.params)
        for a, b in zip(jax.tree.leaves(params["plain"]),
                        jax.tree.leaves(params["ladder"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

class TestSpatialShardedTrainStep:
    def test_dp_tp_sp_mesh_step(self, cpu_mesh3d):
        """3-axis mesh: batch over dp, wide kernels over tp, image height
        over sp (XLA GSPMD conv halo exchange). One step, finite losses —
        mirrors __graft_entry__.dryrun_multichip's 8-device demo."""
        from pdf_table_tpu.models.lore import LoreConfig
        from pdf_table_tpu.train.lore_trainer import (LoreTrainArgs,
                                                      LoreTrainer)

        cfg = LoreConfig(backbone="resnet18", resolution=(64, 64),
                         max_objs=4, hidden_size=32, head_conv=16,
                         tsfm_layers=1, stacking_layers=1, num_heads=4,
                         max_fmp_size=64)
        dp = cpu_mesh3d.shape["dp"]
        args = LoreTrainArgs(learning_rate=1e-3, batch_size=dp,
                             save_every=0)
        trainer = LoreTrainer(cfg, args, mesh=cpu_mesh3d)
        rng = np.random.default_rng(0)
        B = dp
        batch = {
            "image": rng.normal(size=(B, 64, 64, 3)).astype(np.float32),
            "hm": np.zeros((B, 16, 16, 2), np.float32),
            "hm_ind": np.zeros((B, 4), np.int64),
            "hm_mask": np.ones((B, 4), np.float32),
            "wh": np.ones((B, 4, 8), np.float32),
            "reg": np.zeros((B, 4, 2), np.float32),
            "logic": np.ones((B, 4, 4), np.float32),
            "gt_dets": np.ones((B, 4, 8), np.float32),
        }
        batch["hm"][:, 4, 4, 0] = 1.0
        with cpu_mesh3d:
            m = trainer.train_step(batch)
        assert all(np.isfinite(float(v)) for v in m.values())


class TestWtwMetric:
    def test_perfect_match(self):
        from pdf_table_tpu.eval import TableWtwMetric

        m = TableWtwMetric()
        boxes = [[0, 0, 10, 10], [20, 0, 30, 10]]
        axes = [[0, 0, 0, 0], [0, 0, 1, 1]]
        m.update(boxes, axes, boxes, axes)
        r = m.compute()
        assert r["precision"] == 1.0 and r["recall"] == 1.0
        assert r["axis_accuracy"] == 1.0

    def test_partial(self):
        from pdf_table_tpu.eval import TableWtwMetric

        m = TableWtwMetric()
        m.update([[0, 0, 10, 10]], [[0, 0, 0, 0]],
                 [[0, 0, 10, 10], [20, 0, 30, 10]],
                 [[0, 0, 0, 1], [0, 0, 1, 1]])
        r = m.compute()
        assert r["recall"] == 0.5 and r["precision"] == 1.0
        assert r["axis_accuracy"] == 0.0  # axis mismatch


class TestTEDS:
    def test_identical(self):
        from pdf_table_tpu.eval import TEDS

        html = "<table><tr><td>a</td><td>b</td></tr></table>"
        assert TEDS().evaluate(html, html) == 1.0

    def test_cell_text_difference(self):
        from pdf_table_tpu.eval import TEDS

        a = "<table><tr><td>abcd</td></tr></table>"
        b = "<table><tr><td>abce</td></tr></table>"
        s = TEDS().evaluate(a, b)
        assert 0.8 < s < 1.0
        assert TEDS(structure_only=True).evaluate(a, b) == 1.0

    def test_structure_difference(self):
        from pdf_table_tpu.eval import TEDS

        a = "<table><tr><td>a</td></tr></table>"
        b = "<table><tr><td>a</td><td>b</td></tr></table>"
        s = TEDS().evaluate(a, b)
        assert s < 1.0

    def test_batch(self):
        from pdf_table_tpu.eval import TEDS

        html = "<table><tr><td>x</td></tr></table>"
        scores = TEDS(n_jobs=2).batch_evaluate([html, html], [html, html])
        assert scores == [1.0, 1.0]


class TestPairLoss:
    def test_pair_targets_and_loss(self):
        import jax.numpy as jnp

        from pdf_table_tpu.data import make_lore_targets
        from pdf_table_tpu.train.lore_loss import lore_loss

        quads = np.array([[2, 2, 10, 2, 10, 6, 2, 6]], np.float32)
        logic = np.array([[0, 0, 1, 1]], np.float32)
        t = make_lore_targets(quads, logic, (16, 16), max_objs=4,
                              with_corners=True)
        assert t["mk_mask"].sum() == 4.0
        assert t["st"].shape == (16, 8)
        assert t["ctr_cro_ind"][1] == 5  # slot 1, column pair 1

    def test_vertex_dedup(self):
        """Two adjacent cells sharing an edge: shared corners get ONE slot
        (reference corList dedup, lore_coco_utils.py:434-457)."""
        from pdf_table_tpu.data import make_lore_targets

        quads = np.array([[2, 2, 8, 2, 8, 6, 2, 6],      # cell 0
                          [8, 2, 14, 2, 14, 6, 8, 6]],   # cell 1, shares
                         np.float32)                     # (8,2) and (8,6)
        logic = np.array([[0, 0, 0, 0], [0, 0, 1, 1]], np.float32)
        t = make_lore_targets(quads, logic, (16, 16), max_objs=4,
                              with_corners=True)
        # 8 vertices, 2 shared -> 6 unique corner slots
        assert t["mk_mask"].sum() == 6.0
        # cell 1 vertex 0 is (8,2) == cell 0 vertex 1 -> same slot (1)
        assert t["ctr_cro_ind"][4 * 1 + 0] == 1 * 4 + 0
        assert t["cc_match"][0, 1] == t["cc_match"][1, 0]
        # the shared slot's st row carries vectors for BOTH cells at their
        # own column pairs: pair 1 -> cell 0's center, pair 0 -> cell 1's
        c0 = quads[0].reshape(4, 2).mean(0)
        c1 = quads[1].reshape(4, 2).mean(0)
        np.testing.assert_allclose(t["st"][1, 2:4], [8 - c0[0], 2 - c0[1]])
        np.testing.assert_allclose(t["st"][1, 0:2], [8 - c1[0], 2 - c1[1]])
        # corner sub-pixel reg populated once per unique corner
        assert t["corner_reg_mask"].sum() == 6.0

        # the full loss consumes the dedup targets (incl. corner reg)
        import jax.numpy as jnp

        from pdf_table_tpu.train.lore_loss import lore_loss

        B, H, W, M = 1, 16, 16, 4
        batch = {k: jnp.asarray(v)[None] for k, v in t.items()
                 if k != "image"}
        outputs = {
            "heads": {"wh": jnp.zeros((B, H, W, 8)),
                      "st": jnp.zeros((B, H, W, 8)),
                      "reg": jnp.zeros((B, H, W, 2))},
            "hm": jnp.full((B, H, W, 2), 0.01),
            "logi": jnp.zeros((B, M, 4)),
            "stacked_logi": jnp.zeros((B, M, 4)),
        }
        losses = lore_loss(outputs, batch, wiz_pairloss=True)
        assert "st_l" in losses
        for v in losses.values():
            assert np.isfinite(float(v))


class TestGridSnap:
    def test_snap_aligns_edges(self):
        from pdf_table_tpu.models.lore.processor import LorePostProcessor

        cells = [{"bbox": [0.0, 0.0, 49.0, 20.0]},
                 {"bbox": [51.0, 0.5, 100.0, 20.5]}]
        LorePostProcessor.snap_to_grid(cells, tol=4.0)
        assert cells[0]["bbox"][2] == cells[1]["bbox"][0]
        assert cells[0]["bbox"][1] == cells[1]["bbox"][1]


class TestMergeMode:
    def test_merge_tsr_cells(self):
        from pdf_table_tpu.tasks.table_structure import merge_tsr_cells

        lore = {"cells": [{"bbox": [0, 0, 50, 20]},      # covered
                          {"bbox": [200, 0, 260, 20]}]}  # new
        line = {"cells": [{"bbox": [0, 0, 52, 21], "logic": [0, 0, 0, 0]},
                          {"bbox": [52, 0, 104, 21], "logic": [0, 0, 1, 1]}]}
        merged = merge_tsr_cells(lore, line)
        assert len(merged["cells"]) == 3
        assert all("logic" in c for c in merged["cells"])


class TestDbTargets:
    def test_shrink_and_border(self):
        from pdf_table_tpu.data.det_targets import make_db_targets

        t = make_db_targets([[10, 10, 50, 30]], (64, 64))
        assert t["gt"].shape == (64, 64)
        # shrunk interior positive, original border not
        assert t["gt"][20, 30] == 1.0
        assert t["gt"][10, 10] == 0.0
        # threshold ramp peaks at the box edge, mask covers the band
        assert t["thresh_mask"][10, 30] == 1.0
        assert t["thresh_map"][10, 30] > t["thresh_map"][20, 30]
        assert 0.29 < t["thresh_map"].max() <= 0.71

    def test_ctc_loss_decreases_towards_target(self):
        import jax.numpy as jnp

        from pdf_table_tpu.train.losses import ctc_loss

        B, T, V = 2, 10, 5
        labels = jnp.array([[1, 2, 0, 0], [3, 0, 0, 0]], jnp.int32)
        pads = jnp.array([[0, 0, 1, 1], [0, 1, 1, 1]], jnp.float32)
        bad = jnp.zeros((B, T, V))
        # logits aligned with the labels should score better than uniform
        good = np.zeros((B, T, V), np.float32)
        good[0, :, 1] = 5; good[0, 5:, 2] = 10
        good[1, :, 3] = 8
        assert float(ctc_loss(jnp.asarray(good), labels, pads)) < \
            float(ctc_loss(bad, labels, pads))
