"""Benchmark: end-to-end batched page pipeline on the real chip.

Measures the FULL production path (pipeline/batch_runner.py): 16 synthetic
1224x950 pages -> device resize+normalize -> ONE batched DBNet detection
forward per chunk -> ONE batched PicoDet layout forward per chunk -> pooled
LORE TSR over every table crop of the chunk -> host DB postprocess ->
rotated-crop + width-bucketed CTC recognition sweep -> table + page HTML.
This is the reference's serial per-page loop (ocr_system_task.py:549-734)
re-shaped for TPU batching, covering the same stages BASELINE.json's
metric names (det+rec+layout+TSR e2e).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the ratio against the BASELINE.json north star of 50
pages/s/chip (the reference publishes no numbers — SURVEY.md §6).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_page(seed: int, h: int = 1224, w: int = 950) -> np.ndarray:
    """Synthetic text-like page: dark line bars on white."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 255, np.uint8)
    y = 60
    while y < h - 60:
        n_words = rng.integers(3, 8)
        x = 70
        for _ in range(n_words):
            ww = int(rng.integers(60, 160))
            if x + ww > w - 70:
                break
            img[y:y + 16, x:x + ww] = rng.integers(20, 60)
            x += ww + 18
        y += int(rng.integers(26, 40))
    return img


def build_pipeline(tsr_task_type: str = "wireless",
                   inject_lines: bool = True):
    """Bench pipeline: real code path, load-representative volumes.

    Random weights find no text, so (a) det thresholds drop so candidate
    boxes flow, (b) with ``inject_lines`` a deterministic grid of text-line
    quads is appended after the honest DB postprocess — every downstream
    stage (device warp, 0/180 cls, CTC rec, HTML) then runs at
    converted-weight-like volume, and (c) a floor-threshold single-class
    picodet emits up to 2 'table' regions/page so LORE TSR + table HTML
    carry real load."""
    import os as _os

    from pdf_table_tpu.pipeline.batch_runner import BatchPipeline
    from pdf_table_tpu.pipeline.system import OcrSystemConfig
    from pdf_table_tpu.tasks.detection import OcrDetectionTask
    from pdf_table_tpu.tasks.layout import OcrLayoutTask
    from pdf_table_tpu.tasks.recognition import OcrRecognitionTask
    from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

    # compute dtype for the model forwards. bf16 is the MXU-native
    # precision and mirrors the reference's fp16 deployment path
    # (deploy_utils.py:227-264), but the full-pipeline bf16 arm measured
    # a wash on chip (steady 23.8 vs 23.8-24.2 f32, headline 22.6 vs
    # 22.8 — /tmp/exp_bf16.log, 2026-08-19): the pipeline is tunnel/RTT
    # bound, not device-FLOP bound, so f32 stays the default.
    dt = _os.environ.get("PDFTABLE_BENCH_DTYPE", "float32")
    kw = {} if dt == "float32" else {"dtype": dt}

    cfg = OcrSystemConfig(use_layout=True, use_table=True,
                          use_orientation_cls=False)
    bp = BatchPipeline(cfg, batch_pages=8)
    bp.system._det = OcrDetectionTask(model="PP-OCRv4_det", thresh=0.45,
                                      box_thresh=0.0, max_candidates=48,
                                      **kw)
    bp.system._layout = OcrLayoutTask(model="picodet", task_type="table",
                                      score_threshold=0.05, keep_top_k=2,
                                      **kw)
    bp.system._rec = OcrRecognitionTask(model=cfg.recognizer_model,
                                        lang=cfg.lang, **kw)
    # res_buckets: throughput opt-in (product default is the exact
    # reference resolution; see tasks/table_structure.py)
    bp.system._tsr = OcrTableStructureTask(model="Lore",
                                           task_type=tsr_task_type,
                                           res_buckets="auto", **kw)

    if inject_lines:
        def add_lines(quads, shapes):
            out = []
            for (h, w), q in zip(shapes, quads):
                rng = np.random.default_rng(int(h) * 7 + int(w))
                lines = []
                y = 60
                while y < h - 80 and len(lines) < 30:
                    x = 70
                    ww = int(rng.integers(120, 360))
                    lines.append([[x, y], [x + ww, y],
                                  [x + ww, y + 22], [x, y + 22]])
                    y += 36
                out.append(np.concatenate(
                    [np.asarray(q).reshape(-1, 4, 2),
                     np.asarray(lines, np.float32)], axis=0))
            return out

        orig_det_post = bp._det_post
        orig_boxes_finish = bp._boxes_finish

        def det_post_with_lines(probs_u8, shapes, bucket_hw, det_hw,
                                fast_post=True):
            return add_lines(orig_det_post(probs_u8, shapes, bucket_hw,
                                           det_hw, fast_post), shapes)

        def boxes_finish_with_lines(packed, shapes, bucket_hw, prob_hw):
            return add_lines(orig_boxes_finish(packed, shapes, bucket_hw,
                                               prob_hw), shapes)

        bp._det_post = det_post_with_lines
        bp._boxes_finish = boxes_finish_with_lines
    return bp


def bench_bar_page(rng, size: int):
    """Training pages for the bench detector: dark text-like bars at the
    scale make_page's bars reach the det input (1224x950 canvas -> 960x704
    det input, x0.77 — bars ~12 px tall)."""
    img = np.full((size, size, 3), 255, np.uint8)
    boxes = []
    y = int(rng.integers(10, 24))
    while y < size - 26:
        x = int(rng.integers(8, 24))
        for _ in range(int(rng.integers(1, 4))):
            w = int(rng.integers(40, 120))
            if x + w > size - 10:
                break
            h = int(rng.integers(10, 15))
            img[y:y + h, x:x + w] = int(rng.integers(20, 60))
            boxes.append([x, y, x + w, y + h])
            x += w + int(rng.integers(12, 22))
        y += int(rng.integers(22, 34))
    return img, boxes


def ensure_bench_det_weights(bp) -> bool:
    """Demo-train (ONCE, cached under the model cache) the bench's det
    config to detect make_page text bars, so the bench flows REAL
    detection boxes instead of injected quads (VERDICT r3 #8). Returns
    True when trained weights are loaded into bp's det task."""
    import os

    from pdf_table_tpu.engine.params import (has_saved_params, load_params,
                                             save_params)
    from pdf_table_tpu.utils.constants import Constants

    from pdf_table_tpu.engine.params import commit_params

    det = bp.system.det_task
    cache = os.path.join(Constants.MODEL_CACHE_DIR, "bench_demo",
                         "det_ppocr_bars")
    det.ensure_built()
    def arm(variables) -> bool:
        # commit once: numpy params re-upload per call otherwise (the
        # r5 det forward measured 114 ms/chunk with cached weights vs
        # ~25 ms device time — all param copy-starts over the tunnel)
        det._params = commit_params(variables)
        # the floor thresholds existed for RANDOM weights (nothing flows
        # otherwise); a trained det uses reference-like confidence gates
        # so the measured volume is the page's ~30 real bars, not the
        # 64-component CC cap
        det.model_config.thresh = 0.3
        det.model_config.box_thresh = 0.55
        return True

    if has_saved_params(cache):
        return arm(load_params(cache))
    from pdf_table_tpu.train.quick_det import train_quick_detector

    variables, first, last = train_quick_detector(
        det.model_config, bench_bar_page, steps=250, size=320,
        batch_size=4, time_budget_s=300.0,
        log=lambda m: print("  [bench det]", m, file=sys.stderr))
    if not (last < first * 0.5):     # did not learn — keep random+inject
        return False
    save_params(variables, cache)
    return arm(variables)


def n_error_pages(results) -> int:
    """Pages that fell to the runner's fault containment (_error_output):
    they complete in microseconds, so counting them as throughput turns a
    wedged device session into a fake 300 pages/s (observed in the first
    round-5 bench tail). Every timed section must check this."""
    return sum(1 for r in results
               if isinstance(getattr(r, "metric", None), dict)
               and "error" in r.metric)


def timed_run(bp, pages):
    """One timed bp.run with output validation: returns
    (pages_per_sec, results) or raises RuntimeError on error pages —
    a wedged-session measurement must never masquerade as throughput."""
    t0 = time.perf_counter()
    results = bp.run(pages)
    dt = time.perf_counter() - t0
    err = n_error_pages(results)
    if err:
        raise RuntimeError(
            f"invalid measurement: {err}/{len(pages)} error pages "
            "(device fault during timed run)")
    return len(pages) / dt, results


def bench() -> dict:
    t_bench0 = time.perf_counter()
    import os

    # keep first-call args of every hot program so mfu_probe can
    # re-execute them for device-only timing (utils/profiling.py)
    os.environ["PDFTABLE_TRACK_PROGRAMS"] = "1"
    # TSR: LORE wireless (768^2) — the throughput config; the tail reports
    # the system-default wtw (1024^2 + host corner refine) alongside
    bp = build_pipeline("wireless", inject_lines=False)
    # organic volume: demo-trained det weights find the synthetic pages'
    # ~30 text bars for real; only if training is unavailable does the
    # bench fall back to the injected-quad volume of rounds 2-3
    try:
        organic = ensure_bench_det_weights(bp)
    except Exception as e:
        # not silent: the fallback renames the headline metric to
        # det=injected (below); PDFTABLE_BENCH_REQUIRE_ORGANIC=1 turns
        # it into a hard failure for runs that must prove organic load
        if os.environ.get("PDFTABLE_BENCH_REQUIRE_ORGANIC"):
            raise
        print(f"  [bench det] training failed: {e}", file=sys.stderr)
        organic = False
    if not organic:
        bp = build_pipeline("wireless", inject_lines=True)
    pages = [{"image": make_page(i)} for i in range(16)]

    # concurrent compile warmup (overlapped remote compiles), then
    # settling runs through the real path (the first run still compiles
    # the data-dependent leftovers: odd TSR buckets, batch paddings)
    bp.warm()
    bp.run(pages)
    bp.run(pages)

    import contextlib
    import os

    profile_dir = os.environ.get("PDFTABLE_BENCH_PROFILE", "")
    prof = contextlib.nullcontext()
    if profile_dir:
        import jax
        prof = jax.profiler.trace(profile_dir)

    from pdf_table_tpu.utils.profiling import program_registry
    calls_before = {k: tp.calls for k, tp in program_registry.items()}

    n_iters = 7
    iter_dts = []
    with prof:
        for _ in range(n_iters):
            t0 = time.perf_counter()
            results = bp.run(pages)
            iter_dts.append(time.perf_counter() - t0)
            err = n_error_pages(results)
            if err:
                # a wedged session turns later iterations into microsecond
                # error-page sweeps — refusing to average them is the whole
                # point of the honesty gate (first round-5 tail reported
                # 299 pages/s of error pages)
                raise RuntimeError(
                    f"headline invalid: {err}/{len(pages)} error pages "
                    "(device fault mid-measurement)")
    calls_per_iter = {k: (tp.calls - calls_before.get(k, 0)) / n_iters
                      for k, tp in program_registry.items()}
    # median iteration: the shared tunnel has noisy-neighbor episodes
    # (probe h2d has measured 38-134 ms for the same chunk on the same
    # day) — a single stalled iteration shouldn't define throughput
    dt = sorted(iter_dts)[n_iters // 2]
    pages_per_sec = len(pages) / dt
    assert len(results) == len(pages)
    n_tables = sum(len(r.table_structures) for r in results)
    assert n_tables > 0, "bench must exercise the TSR stage"
    boxes_per_page = sum(len(r.text_cells) for r in results) / len(pages)
    organic_volume_low = bool(organic and boxes_per_page < 25)
    if organic_volume_low:
        # don't crash the official artifact: keep the measurement but
        # refuse the 'organic' claim at depressed volume (the published
        # det_boxes_per_page makes the load auditable either way)
        print(f"  [bench] organic det volume low "
              f"({boxes_per_page:.1f} boxes/page < 25) — "
              "reporting organic_det=false", file=sys.stderr)
        organic = False

    # per-stage wall breakdown of the last run (lanes overlap; ms/page).
    # 'det_wait_d2h' includes device det compute hidden behind the async
    # enqueue; the serial probe below separates them.
    n = float(len(pages))
    stages = {k: round(v / n * 1000, 1)
              for k, v in (bp.last_stats or {}).items()
              if k not in ("n_pages",)}

    # workload provenance rides the metric NAME, not just a side flag
    # (VERDICT r4 #8): 'organic' = demo-trained det found the page's text
    # bars for real; 'injected' = random weights + injected quads.
    workload = "organic" if organic else "injected"
    out = {
        "metric": ("e2e_pages_per_sec_per_chip"
                   f"(batched det+rec+layout+TSR+html, det={workload})"),
        "value": round(pages_per_sec, 3),
        "iters_s": [round(t, 3) for t in iter_dts],
        "unit": "pages/s",
        "vs_baseline": round(pages_per_sec / 50.0, 3),
        "workload": workload,
        "organic_det": organic,
        "organic_volume_low": organic_volume_low,
        "det_boxes_per_page": round(boxes_per_page, 1),
        "stages_ms_per_page": stages,
    }
    # EVERYTHING past this point is secondary: the headline measurement is
    # already in `out`, and no probe/tail failure may replace it with an
    # error artifact (round 4 and the first round-5 attempt both lost a
    # healthy headline to an exception raised in the tail — the axon
    # session wedge turns every later device op into INVALID_ARGUMENT)
    try:
        out["probe"] = serial_probe(bp, pages)
    except Exception as e:
        out["probe"] = f"error: {type(e).__name__}: {e}"
    try:
        out["mfu"] = mfu_probe(calls_per_iter, len(pages), dt)
    except Exception as e:
        out["mfu"] = f"error: {type(e).__name__}: {e}"
    # the tail REUSES bp's compiled det/layout/rec programs (a fresh
    # pipeline would pay the ~7-min cold det compile again: the axon
    # remote compiler bypasses the local persistent cache); only the wtw
    # TSR program compiles anew. Skip entirely on a blown wall budget.
    if time.perf_counter() - t_bench0 < 900:
        try:
            out["tail"] = tail_configs(bp, pages)
        except Exception as e:
            out["tail"] = {"error": f"{type(e).__name__}: {e}"}
    else:
        out["tail"] = {"skipped": "wall budget (cold compile run)"}
    return out


def serial_probe(bp, pages) -> dict:
    """Block-synchronized per-stage costs of ONE chunk (ms/page): splits
    the async pipeline into H2D, det compute, det D2H, host post, layout,
    TSR, rec so the bottleneck is attributable (VERDICT r2 #1a)."""
    import jax

    from pdf_table_tpu.pipeline.batch_runner import (det_input_size,
                                                     pack_pages)

    det = bp.system.det_task
    images = [p["image"] for p in pages[:8]]
    groups = pack_pages(images)
    bucket, g = next(iter(groups.items()))
    n = len(g["indices"])
    probe = {}

    t0 = time.perf_counter()
    dev = jax.device_put(g["images"])
    jax.block_until_ready(dev)
    probe["h2d"] = time.perf_counter() - t0

    det_hw = det_input_size(bucket, det.model_config.limit_side_len)
    # warm (cached from main bench loop normally; cheap if so)
    h = bp._detect_enqueue(dev, g["images"].shape, det_hw, pre_resized=False)
    jax.block_until_ready(h)
    t0 = time.perf_counter()
    h = bp._detect_enqueue(dev, g["images"].shape, det_hw, pre_resized=False)
    jax.block_until_ready(h)
    probe["det_device"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    probs_u8 = np.asarray(h)[:n]
    probe["det_d2h"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    quads = bp._det_post(probs_u8, g["shapes"], bucket, det_hw)
    probe["det_host_post"] = time.perf_counter() - t0

    # device-box alternative: CC on device, tiny packed D2H
    h2 = bp._detect_enqueue(dev, g["images"].shape, det_hw,
                            pre_resized=False)
    prob_hw = (h2.shape[1], h2.shape[2])
    pb = bp._boxes_enqueue(h2, g["shapes"], bucket)
    jax.block_until_ready(pb)   # warm/compile
    t0 = time.perf_counter()
    h2 = bp._detect_enqueue(dev, g["images"].shape, det_hw,
                            pre_resized=False)
    pb = bp._boxes_enqueue(h2, g["shapes"], bucket)
    jax.block_until_ready(pb)
    probe["det_plus_cc_device"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    packed = np.asarray(pb)[:n]
    bp._boxes_finish(packed, g["shapes"], bucket, prob_hw)
    probe["det_boxes_d2h_host"] = time.perf_counter() - t0

    if bp.system.config.use_layout and bp.system.layout_task is not None:
        lh = bp.system.layout_task.batch_enqueue_pages(dev)
        t0 = time.perf_counter()
        cells = bp.system.layout_task.batch_finish(*lh)
        probe["layout_finish"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        lh2 = bp.system.layout_task.batch_enqueue_pages(dev)
        _, tables = bp._tables_for_chunk(dev, g["shapes"], lh2)
        probe["layout_tsr"] = time.perf_counter() - t0
        probe["n_tables"] = sum(len(t) for t in tables)

    t0 = time.perf_counter()
    bp._recognize_all_device(np.asarray(g["images"]), quads)
    probe["rec_device_path"] = time.perf_counter() - t0
    probe["n_crops"] = int(sum(len(q) for q in quads))

    return {k: (round(v / n * 1000, 1) if isinstance(v, float) else v)
            for k, v in probe.items()}


def tail_configs(bp, pages, wall_budget_s: float = 1500.0) -> dict:
    """Secondary numbers (VERDICT r2 #7) on the SAME warm pipeline: the
    system-default wtw-LORE TSR config at bench load, and a run through
    the REAL DB box path (no injected quads). Each entry checks the wall
    budget first — the later ones compile fresh programs (wtw TSR, the
    digital 612x792 canvas bucket, the DCN A/B) and the driver's bench
    run must always reach its JSON line."""
    t_tail0 = time.perf_counter()

    def over_budget(label: str) -> bool:
        if time.perf_counter() - t_tail0 > wall_budget_s:
            tail[label] = "skipped (tail wall budget)"
            return True
        return False

    from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

    tail = {}
    # honest det post end-to-end first (no extra compiles: same programs,
    # original _boxes_finish/_det_post restored)
    patched_post = bp._det_post
    patched_finish = bp._boxes_finish
    bp._det_post = type(bp)._det_post.__get__(bp)
    bp._boxes_finish = type(bp)._boxes_finish.__get__(bp)
    try:
        bp.run(pages[:8])  # settle
        pps, res = timed_run(bp, pages[:8])
        tail["real_detpost_pages_per_sec"] = round(pps, 3)
        tail["real_detpost_boxes"] = int(
            sum(len(r.text_cells) for r in res))
    except RuntimeError as e:
        tail["real_detpost_pages_per_sec"] = f"invalid: {e}"
        return tail          # session likely wedged — stop measuring
    finally:
        bp._det_post = patched_post
        bp._boxes_finish = patched_finish

    # default config: wtw LORE 1024^2 + host corner refine, same load —
    # swap only the TSR task; det/layout/rec programs stay warm
    if over_budget("wtw_default_pages_per_sec"):
        return tail
    old_tsr = bp.system._tsr
    try:
        # product default: exact reference resolution (res_buckets=())
        bp.system._tsr = OcrTableStructureTask(model="Lore",
                                               task_type="wtw")
        bp.run(pages)  # warm (compiles the wtw program once)
        pps, _ = timed_run(bp, pages)
        tail["wtw_default_pages_per_sec"] = round(pps, 3)
        # the documented throughput opt-in (res_buckets='auto')
        if not over_budget("wtw_bucketed_pages_per_sec"):
            bp.system._tsr = OcrTableStructureTask(model="Lore",
                                                   task_type="wtw",
                                                   res_buckets="auto")
            bp.run(pages)
            pps, _ = timed_run(bp, pages)
            tail["wtw_bucketed_pages_per_sec"] = round(pps, 3)
    except RuntimeError as e:
        tail["wtw_invalid"] = str(e)
        return tail          # session likely wedged — stop measuring
    finally:
        bp.system._tsr = old_tsr

    # steady state: 48 pages (6 chunks) keeps every lane saturated — the
    # 16-page headline benefits from drain overlap; this is the number a
    # long corpus sees (same programs, no new compiles). Median of 3
    # trials: back-to-back identical runs measured 11.8-18.5 pages/s in
    # round 4 (shared-tunnel noise), so a single sample is a coin flip.
    if over_budget("steady_state_48p_pages_per_sec"):
        return tail
    long_pages = [pages[i % len(pages)] for i in range(48)]
    bp.run(long_pages[:16])  # settle back to the wireless TSR programs
    trials = []
    truncated = False
    invalid = None
    # one UNRECORDED settle run first: the preceding tail sections swap
    # TSR models/resolutions, so the first 48p run after them re-primes
    # lanes and device buffers (measured: trial 1 ran 15-19 vs 22-24 for
    # trials 2-3 across every round-5 session). Steady state by
    # definition excludes that transient; the settle value is still
    # recorded separately for honesty.
    try:
        settle_pps, _ = timed_run(bp, long_pages)
        tail["steady_state_48p_settle"] = round(settle_pps, 3)
    except RuntimeError as e:
        tail["steady_state_48p_invalid"] = str(e)
        return tail
    for _ in range(3):
        try:
            pps, _ = timed_run(bp, long_pages)
        except RuntimeError as e:
            invalid = str(e)
            break
        trials.append(round(pps, 3))
        if time.perf_counter() - t_tail0 > wall_budget_s:
            truncated = True
            break
    tail["steady_state_48p_trials"] = trials
    if truncated:   # recorded separately, never overwritten (ADVICE r4 #2)
        tail["steady_state_48p_truncated"] = "tail wall budget"
    if invalid:
        tail["steady_state_48p_invalid"] = invalid
    # even trial counts (budget cut the loop at 2): the LOWER middle, not
    # the max — the 'median' must not overstate steady state
    if trials:
        tail["steady_state_48p_pages_per_sec"] = \
            sorted(trials)[(len(trials) - 1) // 2]
    if invalid:
        return tail          # session likely wedged — stop measuring

    # born-digital corpus: vector text + LineCellPdf tables ride the
    # batched chunks (host text, batched layout, no det crops / no TSR
    # model) — the reference's dominant real-world input class
    if over_budget("digital_pages_per_sec"):
        return tail
    try:
        tail["digital_pages_per_sec"] = digital_tail(bp)
    except Exception as e:  # keep the primary metric alive
        tail["digital_pages_per_sec"] = f"error: {type(e).__name__}: {e}"

    # fused Pallas DCN back half A/B at the LORE IDAUp shape — records
    # the on-chip number that decides PDFTABLE_PALLAS_DCN's default
    # (ops/pallas/deform_blend.py; gated off until this shows a win)
    if over_budget("dcn_pallas_ab"):
        return tail
    try:
        tail["dcn_pallas_ab"] = dcn_pallas_ab()
    except Exception as e:
        tail["dcn_pallas_ab"] = f"error: {type(e).__name__}: {e}"
    return tail


V5E_PEAK_BF16_FLOPS = 197e12   # TPU v5e per-chip bf16 peak (public spec)


def mfu_probe(calls_per_iter: dict, n_pages: int,
              iter_wall_s: float) -> dict:
    """Per-program device-only time + analytic FLOPs + MFU, and the
    aggregate device ceiling (VERDICT r3 #2).

    Device-only time: re-execute each tracked program with its retained
    first-call args, queued N-deep with one scalar D2H sync (the only
    timing that synchronizes on the tunneled device — PARITY.md).
    FLOPs: pre-optimization HLO cost analysis of the same trace (no
    recompile). Ceiling = throughput if ONLY device execution mattered
    (H2D/D2H/host excluded), using each program's measured per-iteration
    call count.
    """
    import jax
    import jax.numpy as jnp

    from pdf_table_tpu.utils.profiling import program_registry

    # synchronize via a device-side scalar reduce: np.asarray on the full
    # output would drag the whole tensor over the tunnel and bill the
    # D2H to the program (a 28 MB warp output inflated 7 ms to 27 ms)
    reduce_scalar = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def sync(r):
        leaf = next(l for l in jax.tree.leaves(r) if hasattr(l, "shape"))
        _ = float(reduce_scalar(leaf))

    programs = {}
    dev_ms_per_iter = 0.0
    flops_per_iter = 0.0
    flops_known_ms = 0.0
    for name, tp in sorted(program_registry.items()):
        cpi = calls_per_iter.get(name, 0.0)
        if tp.args is None or cpi <= 0:
            continue
        try:
            sync(tp.fn(*tp.args))       # warm / page in
            n = 4
            t0 = time.perf_counter()
            last = None
            for _ in range(n):
                last = tp.fn(*tp.args)
            sync(last)
            ms = (time.perf_counter() - t0) / n * 1000
        except Exception as e:
            programs[name] = f"exec error: {type(e).__name__}"
            continue
        fl = tp.flops()
        row = {"device_ms": round(ms, 2), "calls_per_iter": round(cpi, 2)}
        if fl:
            row["gflops"] = round(fl / 1e9, 2)
            row["mfu_pct"] = round(
                fl / (ms / 1e3) / V5E_PEAK_BF16_FLOPS * 100, 2)
            flops_per_iter += fl * cpi
            flops_known_ms += ms * cpi
        programs[name] = row
        dev_ms_per_iter += ms * cpi
    out = {"programs": programs,
           "peak_bf16_tflops": V5E_PEAK_BF16_FLOPS / 1e12,
           "device_ms_per_page": round(dev_ms_per_iter / n_pages, 2)}
    if dev_ms_per_iter > 0:
        out["device_ceiling_pages_per_sec"] = round(
            n_pages / (dev_ms_per_iter / 1000), 2)
    if flops_per_iter > 0:
        out["e2e_mfu_pct"] = round(
            flops_per_iter / iter_wall_s / V5E_PEAK_BF16_FLOPS * 100, 2)
        out["device_mfu_pct"] = round(
            flops_per_iter / (flops_known_ms / 1000)
            / V5E_PEAK_BF16_FLOPS * 100, 2)
    return out


def dcn_pallas_ab() -> dict:
    """Regression check of the shipped default: the fused Pallas blend
    (auto-on at kc<=2304 since the 2026-08-18 v5e A/B; the losing wide-
    gather variant was deleted) must still beat the forced-XLA form at
    the hot stride-4 LORE shape."""
    import os

    import jax.numpy as jnp

    import pdf_table_tpu.ops.deform_conv as dc

    rng = np.random.default_rng(0)
    B, H, W, C = 8, 256, 256, 64
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    off = jnp.asarray(rng.standard_normal((B, H, W, 18)) * 2, jnp.float32)
    mask = jnp.asarray(rng.random((B, H, W, 9)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)

    def timed(n=6):
        # block_until_ready does not synchronize on axon handles: queue N
        # executions and force a scalar D2H off the last
        r = dc.deform_conv2d(x, off, mask, wgt)
        _ = float(jnp.asarray(r).ravel()[0])
        t0 = time.perf_counter()
        last = None
        for _i in range(n):
            last = dc.deform_conv2d(x, off, mask, wgt)
        _ = float(jnp.asarray(last).ravel()[0])
        return round((time.perf_counter() - t0) / n * 1000, 2), \
            np.asarray(last)

    out = {}
    prev = os.environ.get("PDFTABLE_PALLAS_DCN")
    base_arr = None
    try:
        for label, pal in (("xla_ms", "0"), ("pallas_default_ms", "auto")):
            os.environ["PDFTABLE_PALLAS_DCN"] = pal
            dc.deform_conv2d.clear_cache()
            out[label], arr = timed()
            if base_arr is None:
                base_arr = arr
            else:
                out[label.replace("_ms", "_rel_err")] = round(float(
                    np.abs(arr - base_arr).max()
                    / (np.abs(base_arr).max() + 1e-6)), 5)
    finally:
        if prev is None:
            os.environ.pop("PDFTABLE_PALLAS_DCN", None)
        else:
            os.environ["PDFTABLE_PALLAS_DCN"] = prev
        dc.deform_conv2d.clear_cache()
    return out


def digital_tail(bp, n_pages: int = 16) -> float:
    import os
    import tempfile

    from pdf_table_tpu.pdfio import writer
    from pdf_table_tpu.pdfio.reader import PdfDocument

    doc = writer.PdfWriter()
    for i in range(n_pages):
        pg = doc.add_page(612, 792)
        y = 740
        for j in range(12):
            pg.text(60, y, f"paragraph line {i}-{j} with running text")
            y -= 22
        pg.table(60, 430, [110, 90, 90, 90], 24,
                 [[f"r{r}c{c}" for c in range(4)] for r in range(8)])
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "digital.pdf")
        doc.save(path)
        pdf = PdfDocument.open(path)
        pages = [{"pdf_page": pdf.load_page(i), "pdf_doc": pdf, "page": i}
                 for i in range(n_pages)]
        bp.run(pages)   # settle (rasterize cache cold, layout warm)
        pps, res = timed_run(bp, pages)
        n_tables = sum(len(r.table_html) for r in res)
        assert n_tables >= n_pages // 2, f"only {n_tables} tables extracted"
    return round(pps, 3)


_PROBE_SRC = """
import faulthandler
faulthandler.dump_traceback_later(80, exit=True)
import jax
jax.devices()
print("OK", flush=True)
"""


def _check_device_responsive(total_wait_s: float | None = None) -> bool:
    """The tunneled chip's first jax.devices() can BLOCK FOREVER if a dead
    client still holds the pool claim (axon grant queue) — a hang, not an
    exception, so bench() would never reach its error handler. Probe device
    init in a SUBPROCESS (an in-process blocked init would pin this
    process's backend lock and make a same-process retry meaningless) and
    keep retrying until the claim frees or the wait budget runs out: pool
    claims wedge for minutes-to-hours when a holder dies, and a delayed
    valid number beats a fast error artifact (VERDICT r4 #1). The probe
    self-exits via faulthandler rather than being killed, so it can never
    become a claim holder that dies mid-grant. Budget:
    PDFTABLE_BENCH_CLAIM_WAIT_S (default 2700)."""
    import subprocess

    if total_wait_s is None:
        total_wait_s = float(os.environ.get(
            "PDFTABLE_BENCH_CLAIM_WAIT_S", "2700"))
    deadline = time.time() + total_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True, timeout=120)
            if "OK" in out.stdout:
                if attempt > 1:
                    print(f"# claim freed on probe attempt {attempt}",
                          file=sys.stderr, flush=True)
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print(f"# device claim blocked (probe {attempt}); retrying "
              f"({int(deadline - time.time())}s of budget left)",
              file=sys.stderr, flush=True)
        time.sleep(min(180.0, max(10.0, deadline - time.time())))


def main() -> int:
    try:
        if not _check_device_responsive():
            raise TimeoutError(
                "device init blocked for the whole claim-wait budget "
                "(tunnel claim wedged?)")
        result = bench()
    except Exception as e:  # never crash the driver
        result = {"metric":
                  "e2e_pages_per_sec_per_chip(batched det+rec+layout+TSR+html)",
                  "value": 0.0, "unit": "pages/s", "vs_baseline": 0.0,
                  "error": f"{type(e).__name__}: {e}"}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
