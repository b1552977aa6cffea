"""Steady-state A/B: batch_pages x lane_workers on the tunneled chip.

ONE pipeline reused across configs (a fresh pipeline would pay the
multi-minute remote det compile per config; batch_pages=16 still compiles
its own det/layout/rec shapes once). Each config runs the same 48-page
corpus 3x after a settle run; prints median pages/s + the stage split of
the median trial. Exits on its own (never kill mid-claim)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np

import bench as benchmod

CONFIGS = [
    {"batch_pages": 8, "lane_workers": 2},    # current default
    {"batch_pages": 8, "lane_workers": 3},
    {"batch_pages": 16, "lane_workers": 2},
    {"batch_pages": 16, "lane_workers": 3},
    {"batch_pages": 8, "lane_workers": 2},    # repeat: window-drift control
]


def run_config(bp, pages48, kw):
    for k, v in kw.items():
        setattr(bp, k, v)
    bp.run(pages48)   # settle + compile any new batch-shape programs
    trials, stats = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        bp.run(pages48)
        trials.append(48 / (time.perf_counter() - t0))
        stats.append(bp.last_stats)
    med_i = sorted(range(3), key=lambda i: trials[i])[1]
    print(f"== {kw}")
    print(f"   trials: {[round(t, 2) for t in trials]}  "
          f"median {trials[med_i]:.2f} pages/s")
    st = stats[med_i]
    n = st.get("n_pages", 48.0)
    for k, v in sorted(st.items(), key=lambda kv: -kv[1]):
        if k == "n_pages":
            continue
        print(f"    {k:>18}: {v / n * 1000:7.1f} ms/page")
    sys.stdout.flush()
    return trials[med_i]


if __name__ == "__main__":
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
    results = {}
    for kw in CONFIGS:
        try:
            results[str(kw)] = round(run_config(bp, pages48, kw), 2)
        except Exception as e:
            results[str(kw)] = f"error: {type(e).__name__}: {e}"
            print("config failed:", kw, e)
    print("SUMMARY:", results)
