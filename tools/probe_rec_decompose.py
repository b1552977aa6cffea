"""Decompose the fused rec program (warp / cls / rec fwd / ctc) on chip."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

import bench as benchmod
from pdf_table_tpu.ops.warp import resample_axis_aligned_crops

bp = benchmod.build_pipeline("wireless", inject_lines=False)
rec = bp.system.rec_task
rec.ensure_built()
cls_task = bp.system.textline_cls_task
cls_task.ensure_built()
cfg = rec.model_config
ccfg = cls_task.model_config
print("rec input h", cfg.img_height, "buckets", cfg.width_buckets,
      "cls size", ccfg.img_size)

reduce_scalar = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def sync(r):
    leaf = next(l for l in jax.tree.leaves(r) if hasattr(l, "shape"))
    _ = float(reduce_scalar(leaf))


def timeit(fn, *args, n=4):
    sync(fn(*args))
    t0 = time.perf_counter()
    last = None
    for _ in range(n):
        last = fn(*args)
    sync(last)
    return (time.perf_counter() - t0) / n * 1000


N, H, W = 8, 1280, 960
nb = 512
bucket = cfg.width_buckets[-1]
oh = cfg.img_height
rng = np.random.default_rng(0)
pages = jnp.asarray(rng.integers(0, 255, (N, H, W, 3), np.uint8))
boxes = np.zeros((nb, 4), np.float32)
boxes[:, 0] = rng.uniform(0, 600, nb)
boxes[:, 1] = rng.uniform(0, 1100, nb)
boxes[:, 2] = boxes[:, 0] + rng.uniform(60, 350, nb)
boxes[:, 3] = boxes[:, 1] + rng.uniform(16, 30, nb)
pidx = jnp.asarray(rng.integers(0, N, nb, np.int32))
widths = jnp.asarray(np.clip(
    ((boxes[:, 2] - boxes[:, 0]) * oh
     / np.maximum(boxes[:, 3] - boxes[:, 1], 1)).astype(np.int32),
    1, bucket))
mats = jnp.asarray(boxes)

f_warp = jax.jit(lambda p, x, m, w: resample_axis_aligned_crops(
    p, x, m, (oh, bucket), dst_w=w.astype(jnp.float32), valid_w=w))
crops = f_warp(pages, pidx, mats, widths)

ch, cw = ccfg.img_size
f_cls_warp = jax.jit(lambda p, x, m: resample_axis_aligned_crops(
    p, x, m, (ch, cw)))
ci = f_cls_warp(pages, pidx, mats)

cmean = jnp.asarray([0.485, 0.456, 0.406])
cstd = jnp.asarray([0.229, 0.224, 0.225])
f_cls_fwd = jax.jit(lambda v, ci: cls_task._apply_fn(
    v, {"image": ((ci / 255.0 - cmean) / cstd).astype(jnp.float32)}))
f_rec_fwd = jax.jit(lambda v, c: rec._apply_fn(v, {"image": c}))


def flip_realign(crops, widths):
    rev = crops[:, ::-1, ::-1, :]
    jj = jnp.arange(bucket)[None, :]
    src = jj + (bucket - widths)[:, None]
    src = jnp.clip(src, 0, bucket - 1)
    flipped = jnp.take_along_axis(rev, src[:, None, :, None], axis=2)
    return jnp.where(jj[:, None, :, None] < widths[:, None, None, None],
                     flipped, 0.0)


f_flip = jax.jit(flip_realign)

# cls input derived from the warped crop instead of a second page warp
f_cls_from_crop = jax.jit(lambda c, w: resample_axis_aligned_crops(
    c, jnp.arange(nb, dtype=jnp.int32),
    jnp.stack([jnp.zeros_like(w, jnp.float32),
               jnp.zeros_like(w, jnp.float32),
               w.astype(jnp.float32),
               jnp.full_like(w, oh, jnp.float32)], axis=1), (ch, cw)))

print(f"warp rec crops    {timeit(f_warp, pages, pidx, mats, widths):8.2f} ms")
print(f"flip+realign      {timeit(f_flip, crops, widths):8.2f} ms")
print(f"cls warp (page)   {timeit(f_cls_warp, pages, pidx, mats):8.2f} ms")
print(f"cls warp (crop)   {timeit(f_cls_from_crop, crops, widths):8.2f} ms")
print(f"cls fwd           {timeit(f_cls_fwd, cls_task._params, ci):8.2f} ms")
print(f"rec fwd           {timeit(f_rec_fwd, rec._params, crops):8.2f} ms")

f_warp_both = jax.jit(lambda p, x, m, w: resample_axis_aligned_crops(
    p, x, m, (oh, bucket), dst_w=w.astype(jnp.float32), valid_w=w,
    also_flipped=True))
print(f"warp+flip fused   "
      f"{timeit(f_warp_both, pages, pidx, mats, widths):8.2f} ms")
