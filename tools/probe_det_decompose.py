"""Decompose the fused det+CC program's 106 ms/chunk on the v5e."""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from pdf_table_tpu.pipeline.batch_runner import BatchPipeline, det_input_size
from pdf_table_tpu.pipeline.system import OcrSystemConfig
from pdf_table_tpu.ops.pallas.resize_norm import resize_normalize_xla
from pdf_table_tpu.ops import batch_component_boxes_u8

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


bp = BatchPipeline(OcrSystemConfig(), batch_pages=8)
det = bp.system.det_task
det.ensure_built()
cfg = det.model_config
H, W = 1280, 960
nh, nw = det_input_size((H, W), cfg.limit_side_len)
print("det input", nh, nw)
N = 8
rng = np.random.default_rng(0)
raw = jnp.asarray(rng.integers(0, 255, (N, H, W, 3), np.uint8))
mean = jnp.array([0.485, 0.456, 0.406])
std = jnp.array([0.229, 0.224, 0.225])

f_resize = jax.jit(lambda u: resize_normalize_xla(
    u.astype(jnp.float32) / 255.0, (nh, nw), mean, std))
x_norm = f_resize(raw)
x_norm.block_until_ready()

f_fwd = jax.jit(lambda v, x: det._apply_fn(v, {"image": x})["prob"])
prob = f_fwd(det._params, x_norm)


def pool_q(prob):
    p = jax.lax.reduce_window(prob, -jnp.inf, jax.lax.max, (1, 2, 2),
                              (1, 2, 2), "VALID")
    return jnp.round(p * 255.0).astype(jnp.uint8)


f_pool = jax.jit(pool_q)
probs_u8 = f_pool(prob)
ph, pw = nh // 2, nw // 2
valid = jnp.asarray(np.tile(np.array([[ph, pw]], np.int32), (N, 1)))
thr = int(round(cfg.thresh * 255))
f_cc = jax.jit(lambda p, v: batch_component_boxes_u8(p, thr, v,
                                                     max_components=64))


def fused(v, u, val):
    x = resize_normalize_xla(u.astype(jnp.float32) / 255.0, (nh, nw), mean,
                             std)
    prob = det._apply_fn(v, {"image": x})["prob"]
    pq = pool_q(prob)
    return batch_component_boxes_u8(pq, thr, val, max_components=64)


f_fused = jax.jit(fused)

# also: det fwd in f32 for comparison of dtype effect
print("param dtype sample:",
      jax.tree.leaves(det._params)[0].dtype, "cfg dtype:", cfg.dtype)

print(f"resize+norm      {timeit(f_resize, raw):8.2f} ms")
print(f"det fwd          {timeit(f_fwd, det._params, x_norm):8.2f} ms")
print(f"pool+quant       {timeit(f_pool, prob):8.2f} ms")
print(f"CC boxes         {timeit(f_cc, probs_u8, valid):8.2f} ms")
print(f"fused (current)  {timeit(f_fused, det._params, raw, valid):8.2f} ms")
