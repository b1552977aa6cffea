"""One-process on-chip experiment driver: build + warm the bench pipeline
ONCE, then run a comma-separated list of experiments, amortizing the
multi-minute remote compile across all of them.

    python tools/exp.py stages,chunksweep,order

Experiments:
  stages      — one 48-page run; dump bp.last_stats (wall per stage)
  chunksweep  — batch_pages in {8, 12, 16} x 48-page run, interleaved 2x
  order       — layout_first on/off, 16p + 48p interleaved
  headline    — the bench headline protocol (7x16 pages, median)
"""
import json
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402


def median(xs):
    xs = sorted(xs)
    return xs[(len(xs) - 1) // 2] if len(xs) % 2 else \
        0.5 * (xs[len(xs) // 2 - 1] + xs[len(xs) // 2])


def exp_stages(bp, pages16, pages48):
    pps, _ = bench.timed_run(bp, pages48)
    stats = {k: round(v / 48 * 1000, 1)
             for k, v in (bp.last_stats or {}).items() if k != "n_pages"}
    return {"pages_per_sec_48p": round(pps, 2), "stages_ms_per_page": stats}


def exp_lanes(bp, pages16, pages48):
    """Sub-stage attribution inside the layout + TSR lanes (ms/page over
    two 48-page runs), via the env-gated trace_acc sites."""
    import os

    from pdf_table_tpu.utils.profiling import drain_trace

    os.environ["PDFTABLE_LANE_TRACE"] = "1"
    try:
        drain_trace()
        pps = []
        for _ in range(2):
            p, _r = bench.timed_run(bp, pages48)
            pps.append(round(p, 2))
        tr = drain_trace()
    finally:
        os.environ.pop("PDFTABLE_LANE_TRACE", None)
    return {"pages_per_sec": pps,
            "trace_ms_per_page": {k: round(v / 96 * 1000, 2)
                                  for k, v in sorted(tr.items())}}


def exp_timeline(bp, pages16, pages48):
    """Per-chunk lane spans for ONE 48-page run, as ms offsets from run
    start — the critical-path view (who waits on whom)."""
    import os

    from pdf_table_tpu.utils.profiling import drain_events

    os.environ["PDFTABLE_LANE_TRACE"] = "1"
    try:
        drain_events()
        t0 = time.perf_counter()
        import time as _t
        w0 = _t.time()
        pps, _r = bench.timed_run(bp, pages48)
        evs = drain_events()
    finally:
        os.environ.pop("PDFTABLE_LANE_TRACE", None)
    del t0
    rows = [f"{(a - w0) * 1000:7.0f} ->{(b - w0) * 1000:7.0f}  "
            f"[{(b - a) * 1000:6.0f}ms] {lab}"
            for lab, a, b in sorted(evs, key=lambda e: e[1])]
    return {"pages_per_sec": round(pps, 2), "spans": rows}


def exp_chunksweep(bp, pages16, pages48):
    out = {}
    for trial in range(2):
        for nbp in (8, 12, 16):
            bp.batch_pages = nbp
            if trial == 0:
                bp.run(pages16)   # compile any new padding buckets
            pps, _ = bench.timed_run(bp, pages48)
            out.setdefault(str(nbp), []).append(round(pps, 2))
            print(f"chunksweep batch_pages={nbp} trial={trial}: "
                  f"{pps:.2f} pages/s", flush=True)
    bp.batch_pages = 8
    return {k: {"median": round(median(v), 2), "all": v}
            for k, v in out.items()}


def exp_order(bp, pages16, pages48):
    res = {}
    for trial in range(4):
        for arm, flag in (("det_first", False), ("layout_first", True)):
            bp.layout_first = flag
            pps, _ = bench.timed_run(bp, pages16)
            res.setdefault(arm + "_p16", []).append(round(pps, 2))
    for trial in range(2):
        for arm, flag in (("det_first", False), ("layout_first", True)):
            bp.layout_first = flag
            pps, _ = bench.timed_run(bp, pages48)
            res.setdefault(arm + "_p48", []).append(round(pps, 2))
    bp.layout_first = True
    return {k: {"median": round(median(v), 2), "all": v}
            for k, v in res.items()}


def exp_headline(bp, pages16, pages48):
    dts = []
    for _ in range(7):
        t0 = time.perf_counter()
        r = bp.run(pages16)
        dts.append(time.perf_counter() - t0)
        if bench.n_error_pages(r):
            return {"invalid": "error pages"}
    return {"pages_per_sec": round(16 / median(dts), 2),
            "iters_s": [round(t, 3) for t in dts]}


def exp_lanesweep(bp, pages16, pages48):
    """lane_workers sweep: the timeline shows tsr/rec lanes at ~495 ms of
    mostly-blocking wait per chunk; with 2 workers that caps cadence at
    ~250 ms/chunk while the device sits ~50% idle."""
    out = {}
    for trial in range(3):
        for lw in (2, 3, 4, 6):
            bp.lane_workers = lw
            pps, _ = bench.timed_run(bp, pages48)
            out.setdefault(str(lw), []).append(round(pps, 2))
            print(f"lanesweep lw={lw} trial={trial}: {pps:.2f}",
                  flush=True)
    bp.lane_workers = 2
    return {k: {"median": round(median(v), 2), "all": v}
            for k, v in out.items()}


def exp_rtt(bp, pages16, pages48):
    """Transport microcosts on the live session: blocking-fetch RTT for a
    tiny device array (cold vs after copy_to_host_async), one chunk
    upload, and a tiny dispatch+fetch round trip."""
    import numpy as np

    import jax.numpy as jnp

    out = {}

    def med(f, n=7):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append((time.perf_counter() - t0) * 1000)
        return round(median(ts), 2), [round(t, 1) for t in ts]

    small = jnp.zeros((64,), jnp.float32) + 1.0
    _ = np.asarray(small)
    out["fetch_small_cold_ms"] = med(
        lambda: np.asarray(small * 1.00001))[0]

    def fetch_async():
        h = small * 1.00001
        h.copy_to_host_async()
        time.sleep(0.05)
        np.asarray(h)
    out["fetch_small_after_async_ms"] = round(med(fetch_async)[0] - 50, 2)

    imgs = np.stack([bench.make_page(i) for i in range(8)])
    out["upload_chunk_enqueue_ms"] = med(
        lambda: bp._upload_chunk(imgs), 5)[0]

    def upload_sync():
        dev = bp._upload_chunk(imgs)
        np.asarray(dev[0, :1, :1])
    out["upload_chunk_sync_ms"] = med(upload_sync, 5)[0]

    big = jnp.zeros((8, 1224, 950), jnp.uint8)
    _ = np.asarray(big[0, :1, :1])
    out["fetch_9mb_ms"] = med(lambda: np.asarray(big + 1), 3)[0]
    return out


def exp_smallchunk(bp, pages16, pages48):
    """batch_pages sweep focused on the SHORT-corpus (16p headline)
    regime: at 8 pages/chunk a 16-page corpus is only 2 chunks — the
    lanes barely overlap; 4-page chunks give 4 pipeline slots at the
    cost of more dispatches."""
    out = {}
    for nbp in (4, 6, 8):
        bp.batch_pages = nbp
        bp.run(pages16)   # compile new padding buckets off the clock
    for trial in range(3):
        for nbp in (4, 6, 8):
            bp.batch_pages = nbp
            t0 = time.perf_counter()
            r = bp.run(pages16)
            p16 = 16 / (time.perf_counter() - t0) \
                if not bench.n_error_pages(r) else 0.0
            p48, _ = bench.timed_run(bp, pages48)
            out.setdefault(str(nbp), {"p16": [], "p48": []})
            out[str(nbp)]["p16"].append(round(p16, 2))
            out[str(nbp)]["p48"].append(round(p48, 2))
            print(f"smallchunk bp={nbp} trial={trial}: 16p={p16:.2f} "
                  f"48p={p48:.2f}", flush=True)
    bp.batch_pages = 8
    return {k: {"p16_median": round(median(v["p16"]), 2),
                "p48_median": round(median(v["p48"]), 2), "all": v}
            for k, v in out.items()}


def exp_profile(bp, pages16, pages48):
    """jax.profiler capture around ONE steady 48p run + inline plane
    summary (device busy vs span = the ground truth the wall-clock
    lane timers can't give on a noisy tunnel)."""
    import jax

    trace_dir = "/tmp/exp_trace"
    jax.profiler.start_trace(trace_dir)
    try:
        pps, _ = bench.timed_run(bp, pages48)
    finally:
        jax.profiler.stop_trace()
    sys.path.insert(0, "tools")
    import analyze_trace

    planes = analyze_trace.analyze(trace_dir, top=14)
    out = {"pages_per_sec": round(pps, 2), "planes": {}}
    for name, s in planes:
        top_ops = sorted(s["per_op_s"].items(), key=lambda kv: -kv[1])[:14]
        out["planes"][name] = {
            "busy_s": round(s["busy_s"], 3),
            "span_s": round(s["span_s"], 3),
            "top_ops_ms": {k: round(v * 1000, 1) for k, v in top_ops}}
    return out


def exp_fetchab(bp, pages16, pages48):
    """A/B the D2H strategies: per-part copy_to_host_async at dispatch
    (fetch_parts) vs the round-4 device-concat single download, and the
    enqueue-ahead window. All arms share one process/compile state:
    fetch_parts is re-read from env per call in table_structure, and
    the batch_runner copies live on the bp object."""
    import os

    arms = [("concat", False, 0), ("parts", True, 0),
            ("parts_ahead2", True, 2), ("parts_ahead3", True, 3),
            ("concat_ahead2", False, 2)]
    out = {}
    for trial in range(3):
        for name, parts, ahead in arms:
            os.environ["PDFTABLE_FETCH_PARTS"] = "1" if parts else "0"
            bp.fetch_parts = parts
            bp.enqueue_ahead = ahead
            p48, _ = bench.timed_run(bp, pages48)
            t0 = time.perf_counter()
            r = bp.run(pages16)
            p16 = 16 / (time.perf_counter() - t0) \
                if not bench.n_error_pages(r) else 0.0
            out.setdefault(name, {"p48": [], "p16": []})
            out[name]["p48"].append(round(p48, 2))
            out[name]["p16"].append(round(p16, 2))
            print(f"fetchab {name} trial={trial}: 48p={p48:.2f} "
                  f"16p={p16:.2f}", flush=True)
    os.environ.pop("PDFTABLE_FETCH_PARTS", None)
    bp.fetch_parts = False
    bp.enqueue_ahead = 0
    return {k: {"p48_median": round(median(v["p48"]), 2),
                "p16_median": round(median(v["p16"]), 2),
                "all": v} for k, v in out.items()}


EXPS = {"stages": exp_stages, "chunksweep": exp_chunksweep,
        "fetchab": exp_fetchab, "smallchunk": exp_smallchunk,
        "profile": exp_profile,
        "order": exp_order, "headline": exp_headline, "lanes": exp_lanes,
        "timeline": exp_timeline, "lanesweep": exp_lanesweep,
        "rtt": exp_rtt}


def main():
    names = (sys.argv[1] if len(sys.argv) > 1 else "stages").split(",")
    bp = bench.build_pipeline("wireless", inject_lines=False)
    if not bench.ensure_bench_det_weights(bp):
        print("no organic weights — aborting", file=sys.stderr)
        return 1
    pages16 = [{"image": bench.make_page(i)} for i in range(16)]
    pages48 = [{"image": bench.make_page(i % 16)} for i in range(48)]
    t0 = time.perf_counter()
    bp.warm()
    bp.run(pages16)
    bp.run(pages48)
    print(f"[exp] warm in {time.perf_counter() - t0:.1f}s", flush=True)
    out = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            out[name] = EXPS[name](bp, pages16, pages48)
        except Exception as e:
            out[name] = f"error: {type(e).__name__}: {e}"
        print(f"[exp] {name} done in {time.perf_counter() - t0:.1f}s",
              flush=True)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
