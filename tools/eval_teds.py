"""TEDS evaluation harness over saved predictions.

Reference analog: tests/model/ocr_pdf/run_ocr_document.py eval_tsr_result
(:460) scoring saved JSON results with TEDS. Input: a JSONL file of
{"filename": ..., "pred_html": ..., "gt_html": ...} (or separate pred/gt
JSONL keyed by filename).

  python tools/eval_teds.py --pairs results.jsonl [--structure_only] [--jobs 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", required=True,
                   help="JSONL with filename/pred_html/gt_html per line")
    p.add_argument("--structure_only", action="store_true")
    p.add_argument("--jobs", type=int, default=1)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from pdf_table_tpu.eval.teds import TEDS

    preds, gts, names = [], [], []
    with open(args.pairs, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            names.append(d.get("filename", f"row{len(names)}"))
            preds.append(d["pred_html"])
            gts.append(d["gt_html"])

    teds = TEDS(structure_only=args.structure_only, n_jobs=args.jobs)
    scores = teds.batch_evaluate(preds, gts)
    report = {
        "n": len(scores),
        "teds_mean": round(float(np.mean(scores)), 4) if scores else 0.0,
        "teds_median": round(float(np.median(scores)), 4) if scores else 0.0,
        "structure_only": args.structure_only,
        "per_file": {n: round(s, 4) for n, s in zip(names, scores)},
    }
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "per_file"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
