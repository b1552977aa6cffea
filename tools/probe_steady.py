"""Steady-state 48-page decomposition in the current tunnel window."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np

os.environ.setdefault("PDFTABLE_TRACK_PROGRAMS", "1")
import bench as benchmod

bp = benchmod.build_pipeline("wireless", inject_lines=False)
try:
    organic = benchmod.ensure_bench_det_weights(bp)
except Exception as e:
    print("det arm failed:", e)
    organic = False
print("organic:", organic)
pages16 = [{"image": benchmod.make_page(i)} for i in range(16)]
pages48 = [{"image": benchmod.make_page(i)} for i in range(48)]
bp.warm()
bp.run(pages16)
bp.run(pages16)

for trial in range(3):
    t0 = time.perf_counter()
    bp.run(pages48)
    dt = time.perf_counter() - t0
    st = bp.last_stats or {}
    n = st.get("n_pages", 48.0)
    print(f"trial {trial}: {48/dt:.2f} pages/s  ({dt*1000/48:.1f} ms/page)")
    for k, v in sorted(st.items(), key=lambda kv: -kv[1]):
        if k in ("n_pages",):
            continue
        print(f"    {k:>18}: {v/n*1000:7.1f} ms/page")
