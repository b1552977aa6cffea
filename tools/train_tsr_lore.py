"""LORE TSR training entry (reference tests/trainer/run_table_trainer.py +
bin/train_tsr_lore.sh).

Usage:
  python tools/train_tsr_lore.py --image_dir WTW/images \
      --label_path WTW/train.json --steps 1000 [--mesh dp=8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", required=True)
    p.add_argument("--label_path", default=None)
    p.add_argument("--task_type", default="wtw")
    p.add_argument("--backbone", default="dla34")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--output_dir", default="lore_train")
    p.add_argument("--mesh", default=None, help="e.g. dp=8")
    p.add_argument("--eval_every", type=int, default=0)
    p.add_argument("--resume", default=None,
                   help="train_state dir from a previous run "
                        "(save_train_state); resumes optimizer + step")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the forward (bigger batches)")
    p.add_argument("--grad_accum_steps", type=int, default=1)
    args = p.parse_args()

    from pdf_table_tpu.data import WtwDataset
    from pdf_table_tpu.models.lore import LoreConfig
    from pdf_table_tpu.train.lore_trainer import LoreTrainArgs, LoreTrainer

    mesh = None
    if args.mesh:
        import jax
        from jax.sharding import Mesh
        import numpy as np

        n = int(args.mesh.split("=")[1])
        mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("dp",))

    cfg = LoreConfig.wtw(backbone=args.backbone) if args.task_type == "wtw" \
        else LoreConfig.wireless(backbone=args.backbone)
    ds = WtwDataset(args.image_dir, args.label_path, config=cfg)
    print(f"dataset: {len(ds)} images")
    train_args = LoreTrainArgs(learning_rate=args.learning_rate,
                               batch_size=args.batch_size,
                               total_steps=args.steps,
                               output_dir=args.output_dir,
                               remat=args.remat,
                               grad_accum_steps=args.grad_accum_steps)
    trainer = LoreTrainer(cfg, train_args, mesh=mesh)
    if args.resume:
        trainer.restore_train_state(
            args.resume, sample_batch=ds.batch([0] * args.batch_size))
        print(f"resumed at step {int(trainer.state.step)}")
    history = trainer.fit(ds, args.steps)
    trainer.save_checkpoint()
    trainer.save_train_state()
    with open(os.path.join(args.output_dir, "history.json"), "w") as f:
        json.dump(history, f)
    print(f"done; best loss {trainer.best_loss:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
