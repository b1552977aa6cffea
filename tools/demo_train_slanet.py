"""SLANet training demo: structure tokens learned on synthetic tables.

Teacher-forced cross-entropy on structure-token sequences + masked L1 on
normalized td bboxes, on synthetic grid tables; eval greedy-decodes
held-out tables and reports exact-sequence accuracy + TEDS of assembled
structure HTML.

  python tools/demo_train_slanet.py [--steps 800]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_table(rng, size=128):
    import cv2

    img = np.full((size, size, 3), 255, np.uint8)
    n_rows = int(rng.integers(2, 4))
    n_cols = int(rng.integers(2, 4))
    x0, y0 = 10, 10
    x1 = int(rng.integers(size - 40, size - 8))
    y1 = int(rng.integers(size - 40, size - 8))
    xs = np.linspace(x0, x1, n_cols + 1).astype(int)
    ys = np.linspace(y0, y1, n_rows + 1).astype(int)
    for y in ys:
        cv2.line(img, (xs[0], y), (xs[-1], y), 0, 2)
    for x in xs:
        cv2.line(img, (x, ys[0]), (x, ys[-1]), 0, 2)
    return img, n_rows, n_cols, xs, ys


def tokens_for_grid(vocab, n_rows, n_cols, xs, ys, size, max_len):
    """Token ids + per-step normalized bboxes + padding masks."""
    ids = np.full(max_len, vocab.eos_id, np.int32)
    locs = np.zeros((max_len, 8), np.float32)
    loc_mask = np.zeros(max_len, np.float32)
    t = 0
    for r in range(n_rows):
        ids[t] = vocab.token_to_id["<tr>"]; t += 1
        for c in range(n_cols):
            ids[t] = vocab.token_to_id["<td></td>"]
            x1, x2 = xs[c] / size, xs[c + 1] / size
            y1, y2 = ys[r] / size, ys[r + 1] / size
            locs[t] = [x1, y1, x2, y1, x2, y2, x1, y2]
            loc_mask[t] = 1.0
            t += 1
        ids[t] = vocab.token_to_id["</tr>"]; t += 1
    # eos fills the rest
    return ids, locs, loc_mask, t + 1


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--eval_n", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from pdf_table_tpu.engine.params import init_params
    from pdf_table_tpu.models.slanet import SLANet, SLANetConfig
    from pdf_table_tpu.models.slanet.vocab import StructureVocab

    print("backend:", jax.default_backend())
    vocab = StructureVocab()
    SIZE, MAXLEN = 128, 24
    cfg = SLANetConfig(table_max_len=SIZE, hidden_size=96,
                       max_structure_len=MAXLEN)
    model = SLANet(cfg)
    variables = dict(init_params(model, np.zeros((1, SIZE, SIZE, 3),
                                                 np.float32)))
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    tx = optax.adamw(1e-3)
    opt = tx.init(params)

    def norm(img):
        x = img.astype(np.float32) / 255.0
        return (x - np.array([0.485, 0.456, 0.406])) \
            / np.array([0.229, 0.224, 0.225])

    def make_batch(bs=16, seed=None):
        rng = (np.random.default_rng(seed) if seed is not None
               else make_batch.rng)
        imgs = np.zeros((bs, SIZE, SIZE, 3), np.float32)
        ids = np.zeros((bs, MAXLEN), np.int32)
        locs = np.zeros((bs, MAXLEN, 8), np.float32)
        lmask = np.zeros((bs, MAXLEN), np.float32)
        seq_len = np.zeros(bs, np.int32)
        for i in range(bs):
            img, nr, nc, xs, ys = make_table(rng, SIZE)
            imgs[i] = norm(img)
            ids[i], locs[i], lmask[i], seq_len[i] = tokens_for_grid(
                vocab, nr, nc, xs, ys, SIZE, MAXLEN)
        return imgs, ids, locs, lmask, seq_len
    make_batch.rng = np.random.default_rng(0)

    @jax.jit
    def step(params, opt, imgs, ids, locs, lmask, seq_len):
        def loss_fn(p):
            v = {"params": p}
            if bstats:
                v["batch_stats"] = bstats
            out = model.apply(v, imgs, train=False, teacher_tokens=ids)
            logp = jnp.log(out["structure_probs"] + 1e-9)
            steps_mask = (jnp.arange(MAXLEN)[None, :]
                          < seq_len[:, None]).astype(jnp.float32)
            ce = -(jnp.take_along_axis(logp, ids[..., None], -1)[..., 0]
                   * steps_mask).sum() / steps_mask.sum()
            l1 = (jnp.abs(out["loc_preds"] - locs)
                  * lmask[..., None]).sum() / (lmask.sum() * 8 + 1e-6)
            return ce + 2.0 * l1, (ce, l1)

        (loss, (ce, l1)), g = jax.value_and_grad(loss_fn,
                                                 has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss, ce, l1

    first = last = None
    for s in range(args.steps):
        imgs, ids, locs, lmask, seq_len = make_batch()
        params, opt, loss, ce, l1 = step(params, opt, jnp.asarray(imgs),
                                         jnp.asarray(ids), jnp.asarray(locs),
                                         jnp.asarray(lmask),
                                         jnp.asarray(seq_len))
        first = first if first is not None else float(loss)
        last = float(loss)
        if s % 100 == 0:
            print(f"  step {s}: loss {last:.3f} (ce {float(ce):.3f}, "
                  f"l1 {float(l1):.3f})")
    print(f"loss {first:.2f} -> {last:.2f}")

    # eval: greedy decode held-out tables
    v = {"params": params}
    if bstats:
        v["batch_stats"] = bstats
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    exact = 0
    from pdf_table_tpu.eval.teds import TEDS

    teds_scores = []
    teds = TEDS(structure_only=True)
    for i in range(args.eval_n):
        rng = np.random.default_rng(12345 + i)
        img, nr, nc, xs, ys = make_table(rng, SIZE)
        gt_ids, _, _, _ = tokens_for_grid(vocab, nr, nc, xs, ys, SIZE, MAXLEN)
        out = jax.device_get(fwd(v, norm(img)[None].astype(np.float32)))
        pred = out["structure_probs"][0].argmax(-1)
        gt_toks = vocab.decode(gt_ids.tolist())
        pred_toks = vocab.decode(pred.tolist())
        exact += pred_toks == gt_toks
        teds_scores.append(teds.evaluate(
            "<table>" + "".join(t if t != "<td></td>" else "<td></td>"
                                for t in pred_toks) + "</table>",
            "<table>" + "".join(gt_toks) + "</table>"))
    acc = exact / args.eval_n
    mteds = float(np.mean(teds_scores))
    print(f"eval: exact-structure {acc:.2f}, TEDS(structure) {mteds:.3f}")
    print("DEMO", "PASS" if acc >= 0.75 else "PARTIAL")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
