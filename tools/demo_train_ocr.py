"""OCR training demo: DBNet + CTC recognizer learn synthetic rendered text,
then the production pipeline reads a fresh page.

Three stages on the attached device:
  1. recognizer: tiny SVTR-LCNet + CTC on rendered words -> word accuracy
  2. detector: DBNet (mobilenetv3) + DB loss on rendered pages -> box F1
  3. end-to-end: OcrSystemTask with both trained models on a held-out page
     -> extracted text compared against ground truth

  python tools/demo_train_ocr.py [--rec_steps 600] [--det_steps 300]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ("alpha beta gamma delta epsilon table cell row column page text "
         "data value total 2024 2025 100 250 3750 north south east west "
         "revenue cost profit margin index").split()


def render_word(word: str, px: int = 28):
    from PIL import Image, ImageDraw

    from pdf_table_tpu.pdfio.render import _get_font

    font = _get_font(px)
    img = Image.new("RGB", (16 + px * len(word), int(px * 1.6)),
                    (255, 255, 255))
    draw = ImageDraw.Draw(img)
    draw.text((8, px // 4), word, fill=(20, 20, 20), font=font)
    bbox = img.getbbox()  # trims nothing (white) — use text bbox instead
    tb = draw.textbbox((8, px // 4), word, font=font)
    x1, y1, x2, y2 = tb
    arr = np.asarray(img)[max(0, y1 - 2):y2 + 2, max(0, x1 - 2):x2 + 2]
    return arr


def render_page(rng: np.random.Generator, size: int = 320, n_words: int = 8):
    """White page with rendered words; returns (img, boxes, words)."""
    img = np.full((size, size, 3), 255, np.uint8)
    boxes, words = [], []
    y = 16
    while y < size - 40 and len(words) < n_words:
        x = 16
        for _ in range(int(rng.integers(1, 3))):
            w = WORDS[int(rng.integers(0, len(WORDS)))]
            crop = render_word(w, px=int(rng.integers(22, 30)))
            h_c, w_c = crop.shape[:2]
            if x + w_c > size - 16 or y + h_c > size - 16:
                break
            img[y:y + h_c, x:x + w_c] = crop
            boxes.append([x, y, x + w_c, y + h_c])
            words.append(w)
            x += w_c + int(rng.integers(20, 40))
        y += int(rng.integers(44, 60))
    return img, np.asarray(boxes, np.float32), words


def train_recognizer(steps: int, rng: np.random.Generator):
    import jax
    import jax.numpy as jnp
    import optax

    from pdf_table_tpu.engine.params import init_params
    from pdf_table_tpu.models.rec_ctc import (CTCRecModel, RecConfig,
                                              default_en_charset)
    from pdf_table_tpu.models.rec_ctc.processor import resize_norm_crop
    from pdf_table_tpu.train.losses import ctc_loss

    charset = default_en_charset()
    cfg = RecConfig(vocab_size=len(charset), width_buckets=(160,),
                    hidden_size=64)
    model = CTCRecModel(cfg)
    variables = init_params(model, np.zeros((1, 48, 160, 3), np.float32))
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    MAXLAB = 12

    @jax.jit
    def step(params, opt_state, images, labels, label_pad):
        def loss_fn(p):
            v = {"params": p}
            if bstats:
                v["batch_stats"] = bstats
            logits = model.apply(v, images / 127.5 - 1.0, train=False)
            return ctc_loss(logits, labels, label_pad)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def make_batch(bs=32, seed=None):
        r = np.random.default_rng(seed) if seed is not None else rng
        imgs = np.zeros((bs, 48, 160, 3), np.float32)
        labels = np.zeros((bs, MAXLAB), np.int32)
        pads = np.ones((bs, MAXLAB), np.float32)
        texts = []
        for i in range(bs):
            w = WORDS[int(r.integers(0, len(WORDS)))]
            crop = render_word(w, px=int(r.integers(22, 30)))
            # random margins match detector output crops (unclip padding)
            pt, pb = r.integers(0, 10, 2)
            pl, pr_ = r.integers(0, 14, 2)
            crop = np.pad(crop, ((pt, pb), (pl, pr_), (0, 0)),
                          constant_values=255)
            img, _ = resize_norm_crop(crop, 48, 160, 3)
            imgs[i] = img.astype(np.float32)
            ids = charset.encode(w)[:MAXLAB]
            labels[i, :len(ids)] = ids
            pads[i, :len(ids)] = 0.0
            texts.append(w)
        return imgs, labels, pads, texts

    losses = []
    for s in range(steps):
        imgs, labels, pads, _ = make_batch()
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(imgs),
                                       jnp.asarray(labels),
                                       jnp.asarray(pads))
        losses.append(float(loss))
        if s % 100 == 0:
            print(f"  rec step {s}: loss {losses[-1]:.3f}")

    # eval: greedy decode held-out words
    from pdf_table_tpu.ops.ctc import ctc_greedy_decode

    imgs, labels, pads, texts = make_batch(bs=32, seed=777)
    v = {"params": params}
    if bstats:
        v["batch_stats"] = bstats
    logits = model.apply(v, jnp.asarray(imgs) / 127.5 - 1.0, train=False)
    ids, keep, conf = ctc_greedy_decode(logits)
    ids, keep = np.asarray(ids), np.asarray(keep)
    correct = 0
    for i, t in enumerate(texts):
        pred = charset.decode_ids(ids[i][keep[i]].tolist())
        correct += pred == t
    acc = correct / len(texts)
    print(f"  rec: loss {np.mean(losses[:10]):.2f} -> "
          f"{np.mean(losses[-10:]):.2f}; word acc {acc:.2f}")
    final = {"params": params}
    if bstats:
        final["batch_stats"] = bstats
    return cfg, final, charset, acc


def train_detector(steps: int, rng: np.random.Generator):
    from pdf_table_tpu.models.dbnet import DbNetConfig
    from pdf_table_tpu.train.quick_det import train_quick_detector

    cfg = DbNetConfig.ppocr(inner_channels=48, limit_side_len=320,
                            thresh=0.3, box_thresh=0.4)
    variables, first, last = train_quick_detector(
        cfg, lambda r, size: render_page(r, size)[:2], steps=steps,
        size=320, batch_size=4, rng=rng,
        log=lambda m: print(" ", m))
    print(f"  det: loss {first:.2f} -> {last:.2f}")
    return cfg, variables


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rec_steps", type=int, default=600)
    p.add_argument("--det_steps", type=int, default=300)
    args = p.parse_args()

    import jax

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    print("training recognizer...")
    rec_cfg, rec_vars, charset, rec_acc = train_recognizer(args.rec_steps,
                                                           rng)
    print("training detector...")
    det_cfg, det_vars = train_detector(args.det_steps, rng)

    # -- end to end through the production pipeline -------------------------
    from pdf_table_tpu.pipeline.system import OcrSystemConfig, OcrSystemTask
    from pdf_table_tpu.tasks.detection import OcrDetectionTask
    from pdf_table_tpu.tasks.recognition import OcrRecognitionTask

    sys_cfg = OcrSystemConfig(use_layout=False, use_table=False,
                              use_orientation_cls=False)
    st = OcrSystemTask(sys_cfg)
    det_task = OcrDetectionTask(config=det_cfg)
    det_task.ensure_built()
    det_task._params = det_vars
    st._det = det_task
    rec_task = OcrRecognitionTask(config=rec_cfg)
    rec_task.post.charset = charset
    rec_task.ensure_built()
    rec_task._params = rec_vars
    st._rec = rec_task

    img, boxes, words = render_page(np.random.default_rng(31337))
    out = st(image=img)
    got = [(c.text or "").strip() for c in out.text_cells]
    matched = sum(1 for w in words if w in got)
    print(f"e2e: {len(out.text_cells)} boxes; ground truth {len(words)} "
          f"words; matched {matched}")
    print("  gt :", words)
    print("  got:", got)
    ok = rec_acc >= 0.8 and matched >= len(words) * 0.6
    print("DEMO", "PASS" if ok else "PARTIAL")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
