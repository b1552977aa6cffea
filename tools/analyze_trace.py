"""Summarize a jax.profiler trace directory without the TensorBoard UI.

Usage: python tools/analyze_trace.py <trace_dir> [--top 25] [--plane tpu]

Reads the xplane.pb files a `jax.profiler.trace` /
`PDFTABLE_BENCH_PROFILE` / serve `/debug/profile` capture writes, and
prints per-plane busy time plus the top ops by accumulated duration —
the numbers that decide what to optimize next (the rig has no
TensorBoard; the reference has no profiler tooling at all,
SURVEY.md §5)."""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def load_xspaces(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def summarize_plane(plane) -> dict:
    """Aggregate event durations by event-metadata name for one XPlane."""
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    per_op = collections.Counter()
    span_lo, span_hi = None, 0
    for line in plane.lines:
        for ev in line.events:
            dur = ev.duration_ps / 1e12
            name = meta.get(ev.metadata_id, f"id{ev.metadata_id}")
            per_op[name] += dur
            t0 = line.timestamp_ns * 1e-9 + ev.offset_ps / 1e12
            span_lo = t0 if span_lo is None else min(span_lo, t0)
            span_hi = max(span_hi, t0 + dur)
    return {"per_op_s": per_op,
            "busy_s": sum(per_op.values()),
            "span_s": (span_hi - span_lo) if span_lo is not None else 0.0}


def analyze(trace_dir: str, top: int = 25,
            plane_filter: str = "") -> list:
    """Returns [(plane_name, summary_dict)] and prints a report."""
    out = []
    for path, xs in load_xspaces(trace_dir):
        for plane in xs.planes:
            if plane_filter and plane_filter.lower() \
                    not in plane.name.lower():
                continue
            s = summarize_plane(plane)
            if not s["per_op_s"]:
                continue
            out.append((plane.name, s))
            print(f"\n== {plane.name}  ({os.path.basename(path)})")
            print(f"   {len(plane.lines)} lines, "
                  f"{s['busy_s']*1e3:.1f} ms total event time over a "
                  f"{s['span_s']*1e3:.1f} ms span")
            for name, dur in s["per_op_s"].most_common(top):
                print(f"   {dur*1e3:9.2f} ms  {name[:100]}")
    if not out:
        print(f"no planes matched under {trace_dir}", file=sys.stderr)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--plane", default="",
                    help="substring filter, e.g. 'tpu' for device planes")
    args = ap.parse_args()
    analyze(args.trace_dir, args.top, args.plane)
    return 0


if __name__ == "__main__":
    sys.exit(main())
