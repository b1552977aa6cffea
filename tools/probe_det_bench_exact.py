"""Time the EXACT det program the bench builds (via BatchPipeline paths)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

os.environ["PDFTABLE_TRACK_PROGRAMS"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as benchmod

bp = benchmod.build_pipeline("wireless", inject_lines=False)
pages = [{"image": benchmod.make_page(i)} for i in range(8)]
images = [p["image"] for p in pages]

from pdf_table_tpu.pipeline.batch_runner import pack_pages, det_input_size

groups = pack_pages(images)
bucket, g = next(iter(groups.items()))
dev = bp._upload_chunk(g["images"])
det = bp.system.det_task
det_hw = det_input_size(bucket, det.model_config.limit_side_len)
h, _hw = bp._detect_cc_enqueue(dev, g["images"].shape, det_hw, False,
                               g["shapes"], bucket)
np.asarray(h)

from pdf_table_tpu.utils.profiling import program_registry

reduce_scalar = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def sync(r):
    leaf = next(l for l in jax.tree.leaves(r) if hasattr(l, "shape"))
    _ = float(reduce_scalar(leaf))


for name, tp in program_registry.items():
    if not name.startswith("det:") or tp.args is None:
        continue
    print(name)
    for trial in range(3):
        sync(tp.fn(*tp.args))
        n = 6
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            last = tp.fn(*tp.args)
        sync(last)
        ms = (time.perf_counter() - t0) / n * 1000
        print(f"  trial {trial}: {ms:.2f} ms")
