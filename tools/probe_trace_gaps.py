"""Capture a profiler trace of one warm 48-page steady run and print the
device plane's idle GAPS (what the queue was starving on), not just busy
time. Exits on its own."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np

import bench as benchmod

TRACE_DIR = "/tmp/trace_steady"


def device_gaps(trace_dir, top=25):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from analyze_trace import load_xspaces

    for _p, xs in load_xspaces(trace_dir):
        for plane in xs.planes:
            nm = plane.name.lower()
            if "tpu" not in nm and "axon" not in nm and "device" not in nm:
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            evs = []
            for line in plane.lines:
                base = line.timestamp_ns * 1e-9
                for ev in line.events:
                    t0 = base + ev.offset_ps / 1e12
                    evs.append((t0, t0 + ev.duration_ps / 1e12,
                                meta.get(ev.metadata_id, "?")))
            if not evs:
                continue
            evs.sort()
            # merge into busy intervals, record gaps w/ neighbors
            merged = []
            for t0, t1, name in evs:
                if merged and t0 <= merged[-1][1] + 1e-6:
                    if t1 > merged[-1][1]:
                        merged[-1][1] = t1
                        merged[-1][3] = name
                else:
                    merged.append([t0, t1, name, name])
            span = merged[-1][1] - merged[0][0]
            busy = sum(m[1] - m[0] for m in merged)
            print(f"plane {plane.name!r}: span {span*1000:.0f} ms  "
                  f"busy {busy*1000:.0f} ms  ({busy/span*100:.0f}%)  "
                  f"events {len(evs)}")
            gaps = []
            for a, b in zip(merged, merged[1:]):
                gaps.append((b[0] - a[1], a[3], b[2], a[1] - merged[0][0]))
            gaps.sort(reverse=True)
            tot_gap = sum(g[0] for g in gaps)
            print(f"  total idle {tot_gap*1000:.0f} ms in {len(gaps)} gaps; "
                  f"top {top}:")
            for g, after, before, at in gaps[:top]:
                print(f"    {g*1000:7.1f} ms at t={at*1000:7.0f} ms  "
                      f"after {after[:60]!r} -> before {before[:60]!r}")


if __name__ == "__main__":
    import jax

    bp = benchmod.build_pipeline("wireless", inject_lines=False)
    try:
        organic = benchmod.ensure_bench_det_weights(bp)
    except Exception as e:
        print("det arm failed:", e)
    pages16 = [{"image": benchmod.make_page(i)} for i in range(16)]
    pages48 = [{"image": benchmod.make_page(i)} for i in range(48)]
    bp.warm()
    bp.run(pages16)
    bp.run(pages48)
    t0 = time.perf_counter()
    with jax.profiler.trace(TRACE_DIR):
        bp.run(pages48)
    dt = time.perf_counter() - t0
    print(f"traced run: {48/dt:.2f} pages/s")
    sys.stdout.flush()
    device_gaps(TRACE_DIR)
