"""Run the five BASELINE.json driver configs end to end (hermetic).

Each config exercises the exact model routing the driver names, on
synthetic inputs with compact model sizes (weights random unless converted
ones exist — flow/structure assertions, not accuracy):

 1. Single-page English PDF -> PP-OCRv4 det+rec -> text dump (CPU-runnable)
 2. Single-page wired table: PP-OCRv4 OCR + SLANet TSR -> HTML
 3. Multi-page PDF with PicoDet layout routing + LORE (wtw) TSR
 4. Chinese scanned document: DocXLayout + ConvNextViT (document task)
 5. Batch corpus run: financial PDFs, MtlTabNet + full HTML merge

  python tools/run_driver_configs.py [--full]   (--full = real model sizes)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY = {}  # populated in main() per model


def tiny_system(det_kw, rec_cfg, layout=None, tsr=None):
    from pdf_table_tpu.pipeline.system import OcrSystemConfig, OcrSystemTask
    from pdf_table_tpu.tasks.detection import OcrDetectionTask
    from pdf_table_tpu.tasks.recognition import OcrRecognitionTask

    cfg = OcrSystemConfig(use_layout=layout is not None,
                          use_table=tsr is not None,
                          use_orientation_cls=False, render_dpi=72)
    st = OcrSystemTask(cfg)
    st._det = OcrDetectionTask(**det_kw)
    st._rec = OcrRecognitionTask(config=rec_cfg)
    if layout is not None:
        st._layout = layout
    if tsr is not None:
        st._tsr = tsr
    return st


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true",
                   help="full model sizes (slow without a TPU)")
    args = p.parse_args()

    import jax

    from pdf_table_tpu.models.rec_ctc import RecConfig
    from pdf_table_tpu.pdfio.reader import PdfDocument
    from pdf_table_tpu.pdfio.writer import PdfWriter

    print("backend:", jax.default_backend())
    results = {}
    tiny_det = ({} if args.full else
                dict(model="PP-OCRv4_det", inner_channels=48,
                     limit_side_len=96))
    tiny_rec = (RecConfig() if args.full else
                RecConfig(width_buckets=(80,)))

    # -- config 1: EN PDF -> det+rec -> text dump ---------------------------
    t0 = time.time()
    w = PdfWriter()
    page = w.add_page(300, 200)
    page.text(30, 170, "Attention is all you need", size=12)
    page.text(30, 140, "The dominant sequence models are", size=10)
    w.save("/tmp/dc1.pdf")
    st = tiny_system(tiny_det, tiny_rec)
    with PdfDocument.open("/tmp/dc1.pdf") as doc:
        out = st(pdf_page=doc.load_page(0), pdf_doc=doc)
    text = " ".join(c.text for c in out.text_cells)
    assert "Attention" in text
    results["1_en_pdf_text_dump"] = {"ok": True, "n_text": len(out.text_cells),
                                     "s": round(time.time() - t0, 2)}

    # -- config 2: wired table + SLANet ------------------------------------
    t0 = time.time()
    from pdf_table_tpu.tasks.table_structure import OcrTableStructureTask

    slanet = OcrTableStructureTask(
        model="SLANet", **({} if args.full else
                           dict(table_max_len=64, hidden_size=32,
                                max_structure_len=8)))
    img = np.full((120, 120, 3), 255, np.uint8)
    import cv2
    for k in range(3):
        cv2.line(img, (10, 10 + 50 * k), (110, 10 + 50 * k), 0, 2)
        cv2.line(img, (10 + 50 * k, 10), (10 + 50 * k, 110), 0, 2)
    tsr_out = slanet(img)
    from pdf_table_tpu.tasks.table_to_html import OcrTableToHtmlTask
    tsr_out["offset"] = (0, 0)
    html = OcrTableToHtmlTask()(tsr_out, [])
    assert html.startswith("<table")
    results["2_slanet_table_html"] = {"ok": True,
                                      "tokens": len(tsr_out["structure_tokens"]),
                                      "s": round(time.time() - t0, 2)}

    # -- config 3: multi-page + PicoDet routing + LORE wtw ------------------
    t0 = time.time()
    from pdf_table_tpu.tasks.layout import OcrLayoutTask

    layout = OcrLayoutTask(
        model="picodet", lang="en",
        **({} if args.full else dict(img_height=64, img_width=64,
                                     neck_channels=32, head_convs=1)))
    lore = OcrTableStructureTask(
        model="Lore", task_type="wtw",
        **({} if args.full else dict(backbone="resnet18", resolution=(64, 64),
                                     max_objs=8, hidden_size=32, head_conv=16,
                                     tsfm_layers=1, stacking_layers=1,
                                     num_heads=4, max_fmp_size=64)))
    st3 = tiny_system(tiny_det, tiny_rec, layout=layout, tsr=lore)
    w = PdfWriter()
    for i in range(2):
        pg = w.add_page(300, 200)
        pg.text(30, 170, f"Page {i + 1} heading", size=12)
        pg.table(30, 150, [80, 80], 30, [["a", "b"], ["c", "d"]])
    w.save("/tmp/dc3.pdf")
    with PdfDocument.open("/tmp/dc3.pdf") as doc:
        outs = [st3(pdf_page=doc.load_page(i), pdf_doc=doc, page=i)
                for i in range(doc.page_count)]
    assert all("<table" in "".join(o.table_html) for o in outs)
    results["3_layout_lore_multipage"] = {
        "ok": True, "pages": len(outs),
        "tables": sum(len(o.table_html) for o in outs),
        "s": round(time.time() - t0, 2)}

    # -- config 4: DocXLayout + ConvNextViT (document) ----------------------
    t0 = time.time()
    docx = OcrLayoutTask(
        model="DocXLayout",
        **({} if args.full else dict(resolution=(64, 64), head_conv=16,
                                     top_k=10)))
    from pdf_table_tpu.tasks.recognition import OcrRecognitionTask

    cnv = OcrRecognitionTask(config=RecConfig.convnext_vit(vocab_size=97))
    scan = np.full((160, 120, 3), 250, np.uint8)
    scan[30:42, 10:110] = 40
    lay_out = docx(scan)
    rec_out = cnv([scan[30:42, 10:110]])
    assert "layout_cells" in lay_out and len(rec_out["texts"]) == 1
    results["4_docx_convnext_document"] = {
        "ok": True, "layout_boxes": len(lay_out["bboxs"]),
        "s": round(time.time() - t0, 2)}

    # -- config 5: corpus + MtlTabNet + merge -------------------------------
    t0 = time.time()
    import subprocess

    import pdf_table_tpu

    tools_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(
            pdf_table_tpu.__file__))), "tools")
    r = subprocess.run(
        [sys.executable, os.path.join(tools_dir, "run_corpus.py"),
         "--input_dir", "/tmp/dc5_in", "--output_dir", "/tmp/dc5_out",
         "--synthesize", "2", "--table_structure_model", "MtlTabNet"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-500:]
    report = json.load(open("/tmp/dc5_out/corpus_report.json"))
    assert report["pages"] == 8
    results["5_corpus_mtltabnet_merge"] = {
        "ok": True, "pages": report["pages"],
        "pages_per_sec": report["pages_per_sec"],
        "s": round(time.time() - t0, 2)}

    print(json.dumps(results, indent=1))
    print("ALL 5 DRIVER CONFIGS OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
