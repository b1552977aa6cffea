"""Golden-corpus runner: byte-diff + TEDS report over tests/golden/.

  python tools/golden_report.py           # compare against committed goldens
  python tools/golden_report.py --update  # (re)write goldens + REPORT.md

The committed REPORT.md is the standing evidence for the HTML-parity
north star (VERDICT r4 #5): per case, whether the current tree
reproduces the stored artifact byte-for-byte, plus the TEDS similarity
for HTML cases (1.0 on byte equality by construction; reported so a
future drift shows its severity, not just its existence).
"""

from __future__ import annotations

import argparse
import difflib
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests", "golden"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--only", default="", help="comma-separated case names")
    args = ap.parse_args()

    import cases
    from pdf_table_tpu.eval.teds import TEDS

    teds = TEDS(structure_only=False)
    only = set(args.only.split(",")) if args.only else None
    rows = []
    failures = 0
    os.makedirs(cases.EXPECTED_DIR, exist_ok=True)
    for name in cases.all_case_names():
        if only and name not in only:
            continue
        with tempfile.TemporaryDirectory() as td:
            try:
                got = cases.run_case(name, td)
            except Exception as e:
                rows.append((name, "ERROR", f"{type(e).__name__}: {e}"))
                failures += 1
                continue
        exp_path = cases.expected_path(name)
        if args.update or not os.path.exists(exp_path):
            with open(exp_path, "w", encoding="utf-8") as f:
                f.write(got)
            rows.append((name, "written", f"{len(got)} bytes"))
            continue
        want = cases.load_expected(name)
        if got == want:
            score = ""
            if exp_path.endswith(".html") and "<table" in want:
                score = f" teds={teds.evaluate(got, want):.3f}"
            rows.append((name, "byte-equal", f"{len(got)} bytes{score}"))
        else:
            failures += 1
            score = ""
            if exp_path.endswith(".html"):
                try:
                    score = f" teds={teds.evaluate(got, want):.3f}"
                except Exception:
                    pass
            diff = "".join(difflib.unified_diff(
                want.splitlines(True), got.splitlines(True),
                "expected", "got", n=1))[:2000]
            rows.append((name, "DIFF", score.strip() + "\n```diff\n"
                         + diff + "\n```"))

    lines = ["# Golden corpus report", "",
             "Regenerate with `python tools/golden_report.py`; refresh "
             "goldens with `--update` (audit the diff before committing).",
             "", "| case | status | detail |", "|---|---|---|"]
    for name, status, detail in rows:
        d = detail.split("\n")[0]
        lines.append(f"| {name} | {status} | {d} |")
    lines.append("")
    for name, status, detail in rows:
        if "\n" in detail:
            lines.append(f"## {name}\n\n{detail}\n")
    report = "\n".join(lines) + "\n"
    report_path = os.path.join(REPO, "tests", "golden", "REPORT.md")
    if args.update or not os.path.exists(report_path):
        with open(report_path, "w", encoding="utf-8") as f:
            f.write(report)
    print(report)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
