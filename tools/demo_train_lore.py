"""Training demo: LORE learns synthetic wired tables on the TPU.

Generates random grid-table images with exact cell/logical-coordinate
targets, trains a compact LORE (resnet18 trunk) for a few hundred steps,
and evaluates cell detection + logical-axis accuracy on held-out samples
with the WTW metric. Demonstrates the full training path (teacher-forced
forward, losses, adamw, checkpointing) end to end on real hardware.

  python tools/demo_train_lore.py [--steps 300] [--eval_n 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_table_sample(rng: np.random.Generator, size: int = 256):
    """Random grid table image + (quads, logic) in image coords."""
    import cv2

    img = np.full((size, size, 3), 255, np.uint8)
    n_rows = int(rng.integers(2, 5))
    n_cols = int(rng.integers(2, 5))
    x0, y0 = rng.integers(10, 40, 2)
    x1 = int(rng.integers(size - 60, size - 10))
    y1 = int(rng.integers(size - 60, size - 10))
    xs = np.linspace(x0, x1, n_cols + 1).astype(int)
    ys = np.linspace(y0, y1, n_rows + 1).astype(int)
    for y in ys:
        cv2.line(img, (xs[0], y), (xs[-1], y), (0, 0, 0), 2)
    for x in xs:
        cv2.line(img, (x, ys[0]), (x, ys[-1]), (0, 0, 0), 2)
    quads, logic = [], []
    for r in range(n_rows):
        for c in range(n_cols):
            qx1, qx2 = xs[c], xs[c + 1]
            qy1, qy2 = ys[r], ys[r + 1]
            quads.append([qx1, qy1, qx2, qy1, qx2, qy2, qx1, qy2])
            logic.append([r, r, c, c])
            # light cell shading to give the net texture
            if rng.random() < 0.3:
                img[qy1 + 2:qy2 - 2, qx1 + 2:qx2 - 2] = int(
                    rng.integers(200, 250))
    return img, np.asarray(quads, np.float32), np.asarray(logic, np.float32)


class SyntheticTableDataset:
    def __init__(self, config, n: int = 512, seed: int = 0):
        from pdf_table_tpu.models.lore.processor import LorePreProcessor

        self.config = config
        self.n = n
        self.seed = seed
        self.pre = LorePreProcessor(config)

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int):
        from pdf_table_tpu.data import make_lore_targets

        rng = np.random.default_rng(self.seed * 100003 + idx)
        img, quads, logic = make_table_sample(rng, self.config.resolution[0])
        pre = self.pre(img)
        meta = pre["meta"]
        scale = meta["out_w"] / meta["s"]
        targets = make_lore_targets(quads * scale, logic,
                                    (meta["out_h"], meta["out_w"]),
                                    self.config.max_objs)
        targets["image"] = pre["image"][0]
        return targets

    def batch(self, indices):
        items = [self[i] for i in indices]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--eval_n", type=int, default=8)
    p.add_argument("--out", default="/tmp/lore_demo")
    args = p.parse_args()

    import jax

    from pdf_table_tpu.engine.params import init_params
    from pdf_table_tpu.eval import TableWtwMetric
    from pdf_table_tpu.models.lore import (LoreConfig, LoreModel,
                                           LorePostProcessor)
    from pdf_table_tpu.train.lore_trainer import LoreTrainArgs, LoreTrainer

    print("backend:", jax.default_backend())
    cfg = LoreConfig(backbone="resnet18", resolution=(256, 256),
                     max_objs=32, hidden_size=64, head_conv=64,
                     tsfm_layers=1, stacking_layers=1, num_heads=4,
                     d_ff=128, max_fmp_size=64, vis_thresh=0.3)
    ds = SyntheticTableDataset(cfg, n=512)
    targs = LoreTrainArgs(learning_rate=3e-4, batch_size=args.batch_size,
                          total_steps=args.steps, warmup_steps=30,
                          save_every=0, log_every=25,
                          output_dir=args.out)
    trainer = LoreTrainer(cfg, targs)
    history = trainer.fit(ds, args.steps)
    first = np.mean([h["loss"] for h in history[:10]])
    last = np.mean([h["loss"] for h in history[-10:]])
    print(f"loss: first10={first:.3f} last10={last:.3f} "
          f"({(1 - last / first) * 100:.0f}% drop)")
    ckpt = trainer.save_checkpoint()

    # -- eval on held-out samples -------------------------------------------
    model = LoreModel(cfg)
    variables = {"params": jax.device_get(trainer.state.params)}
    if trainer.state.batch_stats:
        variables["batch_stats"] = jax.device_get(trainer.state.batch_stats)
    post = LorePostProcessor(cfg)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    metric = TableWtwMetric()
    eval_ds = SyntheticTableDataset(cfg, n=args.eval_n, seed=999)
    pre = eval_ds.pre
    total_pred = 0
    for i in range(args.eval_n):
        rng = np.random.default_rng(999 * 100003 + i)
        img, quads, logic = make_table_sample(rng, cfg.resolution[0])
        prep = pre(img)
        raw = jax.device_get(fwd(variables, prep["image"]))
        result = post(raw, prep["meta"])
        pred_boxes = [c["bbox"] for c in result["cells"]]
        pred_axes = [c["logic"] for c in result["cells"]]
        gt_boxes = np.stack(
            [[q[::2].min(), q[1::2].min(), q[::2].max(), q[1::2].max()]
             for q in quads])
        metric.update(pred_boxes, pred_axes, gt_boxes, logic.astype(int))
        total_pred += len(pred_boxes)
    r = metric.compute()
    print("eval:", {k: round(v, 3) if isinstance(v, float) else v
                    for k, v in r.items()})
    print(f"checkpoint: {ckpt}")

    # -- trained weights through the TSR task -> table HTML ------------------
    from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask
    from pdf_table_tpu.tasks.table_to_html import OcrTableToHtmlTask

    task = OcrTableStructureTask(model="Lore", config=cfg)
    task._apply_fn, task._params = (
        lambda v, b: model.apply(v, b["image"], train=False)), variables
    task._built = True
    rng = np.random.default_rng(4242)
    img, quads, logic = make_table_sample(rng, cfg.resolution[0])
    tsr = task(img)
    tsr["offset"] = (0, 0)
    html = OcrTableToHtmlTask()(tsr, [])
    n_rows_pred = html.count("<tr>")
    n_rows_gt = int(logic[:, 0].max()) + 1
    print(f"pipeline: {len(tsr['cells'])}/{len(quads)} cells, "
          f"{n_rows_pred}/{n_rows_gt} rows -> {html[:100]}...")
    ok = last < first * 0.5 and r["recall"] > 0.2
    print("DEMO", "PASS" if ok else "PARTIAL",
          f"(loss drop {(1 - last / first) * 100:.0f}%, "
          f"recall {r['recall']:.2f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
