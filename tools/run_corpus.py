"""Corpus runner: batch a directory of PDFs through the pipeline
(driver config #5: multi-document batch run + full HTML merge).

  python tools/run_corpus.py --input_dir pdfs/ --output_dir out/ \
      [--batch_pages 8] [--table_structure_model MtlTabNet] [--synthesize N]

--synthesize N writes N multi-page synthetic financial-style PDFs first
(tables + paragraphs) so the runner is self-contained.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize_corpus(out_dir: str, n_files: int, pages_per_file: int = 4,
                      seed: int = 0) -> None:
    from pdf_table_tpu.pdfio.writer import PdfWriter

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    for fi in range(n_files):
        w = PdfWriter()
        for pi in range(pages_per_file):
            page = w.add_page(612, 792)
            page.text(60, 740, f"Financial report {fi + 1}, page {pi + 1}",
                      size=14)
            page.text(60, 710, "Quarterly summary of regional results.",
                      size=10)
            rows = [["Region", "Q1", "Q2", "Q3"]]
            for name in ("North", "South", "East", "West"):
                rows.append([name] + [str(int(rng.integers(100, 9999)))
                                      for _ in range(3)])
            page.table(60, 680, [120, 90, 90, 90], 26, rows)
            page.text(60, 480, "Notes: figures are unaudited.", size=9)
        w.save(os.path.join(out_dir, f"report_{fi + 1:03d}.pdf"))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_pages", type=int, default=8)
    p.add_argument("--table_structure_model", default="Lore")
    p.add_argument("--synthesize", type=int, default=0)
    args = p.parse_args()

    if args.synthesize:
        synthesize_corpus(args.input_dir, args.synthesize)

    from pdf_table_tpu.cli.main import PAGE_SEP
    from pdf_table_tpu.pdfio.reader import PdfDocument
    from pdf_table_tpu.pipeline.batch_runner import BatchPipeline
    from pdf_table_tpu.pipeline.system import OcrSystemConfig, OcrSystemTask
    from pdf_table_tpu.tasks.to_html import HTML_FOOTER, HTML_HEADER

    os.makedirs(args.output_dir, exist_ok=True)
    cfg = OcrSystemConfig(
        table_structure_model=args.table_structure_model,
        use_layout=False,  # digital corpus: vector tables, no layout model
        use_orientation_cls=False)
    bp = BatchPipeline(cfg, batch_pages=args.batch_pages)

    files = sorted(f for f in os.listdir(args.input_dir)
                   if f.lower().endswith(".pdf"))
    t0 = time.perf_counter()
    n_pages = 0
    summary = []
    for fn in files:
        path = os.path.join(args.input_dir, fn)
        with PdfDocument.open(path) as doc:
            pages = [{"pdf_page": doc.load_page(i), "pdf_doc": doc,
                      "page": i} for i in range(doc.page_count)]
            results = bp.run(pages)
        n_pages += len(results)
        body = f"\n<p>{PAGE_SEP}</p>\n".join(
            f"<!-- page {r.page + 1} -->\n{r.page_html}" for r in results)
        out_html = os.path.join(args.output_dir,
                                os.path.splitext(fn)[0] + ".html")
        with open(out_html, "w", encoding="utf-8") as f:
            f.write(HTML_HEADER + body + "\n" + HTML_FOOTER)
        stats = OcrSystemTask.timing_summary(results)
        summary.append({"file": fn, "pages": len(results),
                        "tables": sum(len(r.table_html) for r in results)})
    dt = time.perf_counter() - t0
    report = {"files": len(files), "pages": n_pages,
              "seconds": round(dt, 2),
              "pages_per_sec": round(n_pages / max(dt, 1e-9), 2),
              "per_file": summary}
    with open(os.path.join(args.output_dir, "corpus_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "per_file"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
