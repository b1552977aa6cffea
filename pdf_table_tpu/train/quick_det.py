"""Quick DBNet fitting on synthetic pages.

Shared by tools/demo_train_ocr.py (the training demo) and bench.py (which
demo-trains the bench detector ONCE, caches the weights, and then runs
its throughput measurement with real detection output instead of
injected quads — VERDICT r3 #8). Loss/targets are the production ones
(train/losses.db_loss, data/det_targets.make_db_targets); only the page
generator differs per caller.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406])
_IMAGENET_STD = np.array([0.229, 0.224, 0.225])


def train_quick_detector(cfg, render_page: Callable,
                         steps: int = 300, size: int = 320,
                         batch_size: int = 4, lr: float = 1e-3,
                         rng: Optional[np.random.Generator] = None,
                         log: Optional[Callable[[str], None]] = None,
                         time_budget_s: Optional[float] = None,
                         early_exit_ratio: Optional[float] = None
                         ) -> Tuple[dict, float, float]:
    """Fit a DBNet config on ``render_page(rng, size) -> (img, boxes)``
    pages. Returns (variables, first_loss, last_loss).

    Tuned for a tunneled device: batches come from a fixed pre-generated
    pool (host target rasterization paid once, not per step) and the
    loss only crosses to the host every ~25 steps (a per-step float()
    costs a full device round trip). ``time_budget_s`` bounds wall time
    — training stops at the next sync point past the budget;
    ``early_exit_ratio`` stops as soon as loss < ratio * first_loss."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..data.det_targets import make_db_targets
    from ..engine.params import init_params
    from ..models.dbnet import DBNet
    from ..train.losses import db_loss

    rng = rng or np.random.default_rng(0)
    model = DBNet(cfg)
    variables = init_params(model, np.zeros((1, size, size, 3), np.float32),
                            train=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state, batch):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bstats}, batch["image"],
                train=True, mutable=["batch_stats"])
            losses = db_loss(out, batch)
            return losses["loss"], (losses, mut["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, opt_state,
                losses)

    def make_batch():
        imgs = np.zeros((batch_size, size, size, 3), np.float32)
        tg = {k: np.zeros((batch_size, size, size), np.float32)
              for k in ("gt", "gt_mask", "thresh_map", "thresh_mask")}
        for i in range(batch_size):
            img, boxes = render_page(rng, size)[:2]
            x = img.astype(np.float32) / 255.0
            imgs[i] = (x - _IMAGENET_MEAN) / _IMAGENET_STD
            t = make_db_targets(boxes, (size, size))
            for k in tg:
                tg[k][i] = t[k]
        batch = {"image": jnp.asarray(imgs)}
        batch.update({k: jnp.asarray(v) for k, v in tg.items()})
        return batch

    import time as _time

    pool = [make_batch() for _ in range(min(steps, 16))]
    sync_every = 25
    first = last = None
    t0 = None   # budget clock starts AFTER the first step's loss lands:
    # on the remote-compile rig the train-step compile alone can eat a
    # 300 s budget (seen live: 'wall budget hit at step 1'), and a budget
    # meant to bound TRAINING time would otherwise cancel a run that
    # never got to train
    for s in range(steps):
        params, bstats, opt_state, losses = step(params, bstats, opt_state,
                                                 pool[s % len(pool)])
        if t0 is None:
            _ = float(losses["loss"])       # block through the compile
            t0 = _time.perf_counter()
        at_sync = (s % sync_every == 0 or s == steps - 1)
        over_budget = (time_budget_s is not None
                       and _time.perf_counter() - t0 > time_budget_s)
        if not (at_sync or over_budget):
            continue
        lv = float(losses["loss"])          # device round trip
        first = lv if first is None else first
        last = lv
        if log is not None:
            log(f"det step {s}: loss {lv:.3f}")
        if over_budget:
            if log is not None:
                log(f"det: wall budget {time_budget_s:.0f}s hit at "
                    f"step {s} — stopping")
            break
        if (early_exit_ratio is not None and s > 0
                and lv < first * early_exit_ratio):
            if log is not None:
                log(f"det: early exit at step {s} "
                    f"(loss {lv:.3f} < {early_exit_ratio} x {first:.3f})")
            break
    return {"params": params, "batch_stats": bstats}, first, last
